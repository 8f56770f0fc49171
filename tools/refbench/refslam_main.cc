/* Head-to-head driver: runs the FULL reference pipeline (ORB_SLAM2::System
   with its real Tracking / LocalMapping / LoopClosing threads,
   /root/reference/src/System.cc:41) over a rendered synthetic sequence, so
   the TPU framework can be compared against the actual reference binary on
   identical frames (VERDICT r2 item 1). Mirrors the reference's own driver
   behavior (Examples/Monocular/mono_tum.cc:53-127: per-frame timing,
   trajectory save) without copying it.

   Usage:
     refslam mono|stereo|rgbd <voc.txt> <settings.yaml> <seq_dir> <out_prefix>

   <seq_dir>/frames.txt lines: "<timestamp> <img> [<img2>]" (paths relative
   to seq_dir; img2 = right image for stereo, 16-bit depth for rgbd).
   Writes <out_prefix>_kf.txt (keyframe trajectory, TUM format) and, for
   stereo/rgbd, <out_prefix>_full.txt (full trajectory). */

#include <algorithm>
#include <chrono>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include <opencv2/core/core.hpp>
#include <opencv2/imgcodecs/imgcodecs.hpp>

#include "System.h"

int main(int argc, char **argv) {
  if (argc != 6) {
    std::cerr << "usage: refslam mono|stereo|rgbd <voc.txt> <settings.yaml> "
                 "<seq_dir> <out_prefix>\n";
    return 1;
  }
  const std::string mode = argv[1];
  const std::string voc = argv[2];
  const std::string settings = argv[3];
  const std::string dir = argv[4];
  const std::string out = argv[5];

  ORB_SLAM2::System::eSensor sensor = ORB_SLAM2::System::MONOCULAR;
  if (mode == "stereo")
    sensor = ORB_SLAM2::System::STEREO;
  else if (mode == "rgbd")
    sensor = ORB_SLAM2::System::RGBD;

  std::ifstream flist(dir + "/frames.txt");
  if (!flist) {
    std::cerr << "cannot open " << dir << "/frames.txt\n";
    return 1;
  }
  std::vector<double> stamps;
  std::vector<std::string> im1, im2;
  std::string line;
  while (std::getline(flist, line)) {
    if (line.empty() || line[0] == '#')
      continue;
    std::istringstream ss(line);
    double t;
    std::string a, b;
    ss >> t >> a;
    stamps.push_back(t);
    im1.push_back(dir + "/" + a);
    if (ss >> b)
      im2.push_back(dir + "/" + b);
    else
      im2.push_back("");
  }
  std::cout << "refslam: " << im1.size() << " frames, mode=" << mode
            << std::endl;

  ORB_SLAM2::System slam(voc, settings, sensor, false);

  std::vector<double> track_ms;
  track_ms.reserve(im1.size());
  for (size_t i = 0; i < im1.size(); ++i) {
    cv::Mat a = cv::imread(im1[i], cv::IMREAD_GRAYSCALE);
    if (a.empty()) {
      std::cerr << "failed to read " << im1[i] << "\n";
      return 1;
    }
    cv::Mat b;
    if (sensor == ORB_SLAM2::System::STEREO)
      b = cv::imread(im2[i], cv::IMREAD_GRAYSCALE);
    else if (sensor == ORB_SLAM2::System::RGBD)
      b = cv::imread(im2[i], cv::IMREAD_UNCHANGED);

    auto t0 = std::chrono::steady_clock::now();
    if (sensor == ORB_SLAM2::System::MONOCULAR)
      slam.TrackMonocular(a, stamps[i]);
    else if (sensor == ORB_SLAM2::System::STEREO)
      slam.TrackStereo(a, b, stamps[i]);
    else
      slam.TrackRGBD(a, b, stamps[i]);
    auto t1 = std::chrono::steady_clock::now();
    track_ms.push_back(
        std::chrono::duration_cast<std::chrono::duration<double, std::milli>>(
            t1 - t0)
            .count());
  }

  slam.Shutdown();

  std::sort(track_ms.begin(), track_ms.end());
  double total = 0;
  for (double v : track_ms)
    total += v;
  std::cout << "median tracking time: " << track_ms[track_ms.size() / 2]
            << " ms\nmean tracking time: " << total / track_ms.size()
            << " ms" << std::endl;

  slam.SaveKeyFrameTrajectoryTUM(out + "_kf.txt");
  if (sensor != ORB_SLAM2::System::MONOCULAR)
    slam.SaveTrajectoryTUM(out + "_full.txt");
  return 0;
}
