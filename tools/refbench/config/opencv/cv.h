/* OpenCV 1.x compatibility shim for building the reference against
   OpenCV 4 (the only version on this host). Maps the legacy umbrella
   header to the modern C++ modules. */
#ifndef REFBENCH_OPENCV_CV_SHIM_H
#define REFBENCH_OPENCV_CV_SHIM_H
#include <opencv2/opencv.hpp>
#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/features2d.hpp>
#include <opencv2/calib3d.hpp>
#endif
