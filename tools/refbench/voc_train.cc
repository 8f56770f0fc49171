/* Trains a DBoW2 ORB vocabulary for the reference pipeline using the
   reference's OWN components: ORBextractor for descriptors
   (/root/reference/src/ORBextractor.cc:1248) and
   TemplatedVocabulary::create / saveToTextFile for the tree
   (/root/reference/Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h). The
   reference ships no vocabulary in this environment (the ~1M-word
   ORBvoc.txt blob was stripped), and System.cc:73 requires one — so the
   head-to-head harness trains one from the same synthetic corpus both
   systems see.

   Usage: refvoc <image_list.txt> <out_voc.txt> [k] [L]
   image_list.txt: one image path per line. */

#include <fstream>
#include <iostream>
#include <string>
#include <vector>

#include <opencv2/core/core.hpp>
#include <opencv2/imgcodecs/imgcodecs.hpp>

#include "ORBVocabulary.h"
#include "ORBextractor.h"

int main(int argc, char **argv) {
  if (argc < 3) {
    std::cerr << "usage: refvoc <image_list.txt> <out_voc.txt> [k] [L]\n";
    return 1;
  }
  int k = argc > 3 ? std::atoi(argv[3]) : 10;
  int L = argc > 4 ? std::atoi(argv[4]) : 4;

  std::ifstream flist(argv[1]);
  std::vector<std::string> paths;
  std::string line;
  while (std::getline(flist, line))
    if (!line.empty())
      paths.push_back(line);

  ORB_SLAM2::ORBextractor extractor(1000, 1.2f, 8, 20, 7);
  std::vector<std::vector<cv::Mat>> features;
  features.reserve(paths.size());
  size_t total = 0;
  for (const auto &p : paths) {
    cv::Mat im = cv::imread(p, cv::IMREAD_GRAYSCALE);
    if (im.empty()) {
      std::cerr << "skip unreadable " << p << "\n";
      continue;
    }
    std::vector<cv::KeyPoint> kps;
    cv::Mat desc;
    extractor(im, cv::Mat(), kps, desc);
    std::vector<cv::Mat> per_image;
    per_image.reserve(desc.rows);
    for (int r = 0; r < desc.rows; ++r)
      per_image.push_back(desc.row(r).clone());
    total += per_image.size();
    features.push_back(std::move(per_image));
  }
  std::cout << "refvoc: " << features.size() << " images, " << total
            << " descriptors; training k=" << k << " L=" << L << std::endl;

  ORB_SLAM2::ORBVocabulary voc(k, L, DBoW2::TF_IDF, DBoW2::L1_NORM);
  voc.create(features);
  std::cout << "vocabulary size: " << voc.size() << std::endl;
  voc.saveToTextFile(argv[2]);
  return 0;
}
