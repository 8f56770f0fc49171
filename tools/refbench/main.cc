// Benchmark driver for the reference ORB-SLAM2 hot path on THIS host.
//
// This file is ours; it links against code compiled straight from
// /root/reference (see CMakeLists.txt). It times, on synthetic frames:
//   1. mono Frame construction (= ORB extraction + undistort + grid) at the
//      TUM operating point (640x480, 1000 features, 8 levels, FAST 20/7)
//   2. ORBmatcher::SearchByProjection(cur, last) — the motion-model matcher
//   3. Optimizer::PoseOptimization — the 4x10 LM schedule (g2o)
//   4. stereo Frame construction (threaded L/R extraction + row-band SAD
//      stereo matching) at the KITTI operating point (1241x376, 2000 feats)
//
// The per-frame tracking proxy reported is
//     track_ms = mono_frame_ms + searchproj_ms + 2 * poseopt_ms
// (TrackWithMotionModel = match + optimize; TrackLocalMap = another
//  search + optimize; reference Tracking.cc:335,423).
//
// Output: one JSON line on stdout.

#include <chrono>
#include <cstdio>
#include <random>
#include <vector>
#include <algorithm>

#include <opencv2/opencv.hpp>

#include "Frame.h"
#include "ORBextractor.h"
#include "ORBmatcher.h"
#include "Optimizer.h"
#include "MapPoint.h"
#include "Map.h"
#include "ORBVocabulary.h"

using namespace ORB_SLAM2;
using Clock = std::chrono::steady_clock;

static double ms_since(Clock::time_point t0) {
  return std::chrono::duration<double, std::milli>(Clock::now() - t0).count();
}

static double median(std::vector<double> v) {
  std::sort(v.begin(), v.end());
  return v[v.size() / 2];
}

// Synthetic textured image: mid-gray background + random rectangles + noise.
// Gives FAST plenty of corners at every pyramid level.
static cv::Mat synth_image(int w, int h, unsigned seed) {
  std::mt19937 rng(seed);
  cv::Mat img(h, w, CV_8UC1, cv::Scalar(128));
  std::uniform_int_distribution<int> dx(0, w - 1), dy(0, h - 1), ds(3, 24),
      dv(0, 255);
  for (int i = 0; i < 900; ++i) {
    int x = dx(rng), y = dy(rng), s = ds(rng);
    cv::rectangle(img, cv::Rect(x, y, s, std::max(2, s / 2)),
                  cv::Scalar(dv(rng)), cv::FILLED);
  }
  cv::Mat noise(h, w, CV_8SC1);
  cv::randn(noise, 0, 3);
  cv::Mat out;
  cv::add(img, noise, out, cv::noArray(), CV_8UC1);
  return out;
}

int main() {
  const int iters = 60;
  ORBVocabulary vocab;  // empty; ComputeBoW never called

  // ---- TUM mono operating point ----------------------------------------
  cv::Mat K = (cv::Mat_<float>(3, 3) << 517.306408f, 0, 318.643040f, 0,
               516.469215f, 255.313989f, 0, 0, 1);
  cv::Mat dist = cv::Mat::zeros(4, 1, CV_32F);
  ORBextractor extractor(1000, 1.2f, 8, 20, 7);
  cv::Mat img = synth_image(640, 480, 1);

  std::vector<double> t_frame;
  Frame lastF, curF;
  for (int i = 0; i < iters; ++i) {
    auto t0 = Clock::now();
    Frame f(img, 0.0, &extractor, &vocab, K, dist, 0.0f, 0.0f);
    t_frame.push_back(ms_since(t0));
    if (i == 0) lastF = Frame(f);
    curF = Frame(f);
  }

  // Populate the last frame with map points back-projected at random depth.
  Map map;
  lastF.SetPose(cv::Mat::eye(4, 4, CV_32F));
  std::mt19937 rng(7);
  std::uniform_real_distribution<float> dz(1.f, 5.f);
  float fx = K.at<float>(0, 0), fy = K.at<float>(1, 1);
  float cx = K.at<float>(0, 2), cy = K.at<float>(1, 2);
  std::vector<MapPoint*> mps(lastF.N, nullptr);
  for (int i = 0; i < lastF.N; ++i) {
    const cv::KeyPoint& kp = lastF.mvKeysUn[i];
    float z = dz(rng);
    cv::Mat pos = (cv::Mat_<float>(3, 1) << (kp.pt.x - cx) / fx * z,
                   (kp.pt.y - cy) / fy * z, z);
    mps[i] = new MapPoint(pos, &map, &lastF, i);
    lastF.mvpMapPoints[i] = mps[i];
  }

  // Current frame: small pose offset so projection search has work to do.
  cv::Mat Tcw = cv::Mat::eye(4, 4, CV_32F);
  Tcw.at<float>(0, 3) = 0.02f;
  Tcw.at<float>(2, 3) = 0.03f;

  ORBmatcher matcher(0.9f, true);
  std::vector<double> t_search, t_pose;
  int nmatched = 0;
  for (int i = 0; i < iters; ++i) {
    curF.SetPose(Tcw);
    std::fill(curF.mvpMapPoints.begin(), curF.mvpMapPoints.end(), nullptr);
    auto t0 = Clock::now();
    nmatched = matcher.SearchByProjection(curF, lastF, 15.0f, true);
    t_search.push_back(ms_since(t0));
    t0 = Clock::now();
    Optimizer::PoseOptimization(&curF);
    t_pose.push_back(ms_since(t0));
  }

  // ---- KITTI stereo operating point -------------------------------------
  cv::Mat Kk = (cv::Mat_<float>(3, 3) << 718.856f, 0, 607.1928f, 0, 718.856f,
                185.2157f, 0, 0, 1);
  ORBextractor exL(2000, 1.2f, 8, 20, 7), exR(2000, 1.2f, 8, 20, 7);
  cv::Mat imL = synth_image(1241, 376, 2);
  cv::Mat imR;
  // right image = left shifted by a plausible disparity field (flat shift ok
  // for timing; the row-band search cost is content-independent)
  cv::Mat M = (cv::Mat_<double>(2, 3) << 1, 0, -12.0, 0, 1, 0);
  cv::warpAffine(imL, imR, M, imL.size(), cv::INTER_LINEAR,
                 cv::BORDER_REPLICATE);
  std::vector<double> t_stereo;
  for (int i = 0; i < iters / 2; ++i) {
    auto t0 = Clock::now();
    Frame fs(imL, imR, 0.0, &exL, &exR, &vocab, Kk, dist, 386.1448f, 35.0f);
    t_stereo.push_back(ms_since(t0));
  }

  double frame_ms = median(t_frame), search_ms = median(t_search),
         pose_ms = median(t_pose), stereo_ms = median(t_stereo);
  double track_ms = frame_ms + search_ms + 2 * pose_ms;
  printf(
      "{\"mono_frame_ms\": %.3f, \"searchproj_ms\": %.3f, \"poseopt_ms\": "
      "%.3f, \"track_ms\": %.3f, \"track_fps\": %.2f, \"stereo_frame_ms\": "
      "%.3f, \"nkp\": %d, \"nmatched\": %d, \"host\": \"2-core VM, same as "
      "tpuslam tests\"}\n",
      frame_ms, search_ms, pose_ms, track_ms, 1000.0 / track_ms, stereo_ms,
      lastF.N, nmatched);
  return 0;
}
