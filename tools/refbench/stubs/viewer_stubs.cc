/* Headless stand-ins for the reference's Pangolin-backed Viewer and
   MapDrawer so the FULL pipeline (System/Tracking/LocalMapping/LoopClosing,
   /root/reference/src/System.cc:41) links without a GL stack. Only the
   method signatures come from the reference headers; every body is a
   no-op (the benchmark runs with bUseViewer=false, so none of these are
   on the measured path). */

#include "MapDrawer.h"
#include "Viewer.h"

#include <opencv2/core/core.hpp>

namespace ORB_SLAM2 {

MapDrawer::MapDrawer(Map *pMap, const std::string &strSettingPath)
    : mpMap(pMap) {
  cv::FileStorage fSettings(strSettingPath, cv::FileStorage::READ);
  mKeyFrameSize = fSettings["Viewer.KeyFrameSize"];
  mKeyFrameLineWidth = fSettings["Viewer.KeyFrameLineWidth"];
  mGraphLineWidth = fSettings["Viewer.GraphLineWidth"];
  mPointSize = fSettings["Viewer.PointSize"];
  mCameraSize = fSettings["Viewer.CameraSize"];
  mCameraLineWidth = fSettings["Viewer.CameraLineWidth"];
}

void MapDrawer::DrawMapPoints() {}
void MapDrawer::DrawKeyFrames(const bool, const bool) {}
void MapDrawer::DrawCurrentCamera(pangolin::OpenGlMatrix &) {}

void MapDrawer::SetCurrentCameraPose(const cv::Mat &Tcw) {
  std::unique_lock<std::mutex> lock(mMutexCamera);
  mCameraPose = Tcw.clone();
}

void MapDrawer::SetReferenceKeyFrame(KeyFrame *) {}
void MapDrawer::GetCurrentOpenGLCameraMatrix(pangolin::OpenGlMatrix &) {}

Viewer::Viewer(System *pSystem, FrameDrawer *pFrameDrawer,
               MapDrawer *pMapDrawer, Tracking *pTracking,
               const std::string &)
    : mpSystem(pSystem), mpFrameDrawer(pFrameDrawer), mpMapDrawer(pMapDrawer),
      mpTracker(pTracking), mbFinishRequested(false), mbFinished(true),
      mbStopped(true), mbStopRequested(false) {}

void Viewer::Run() { SetFinish(); }

void Viewer::RequestFinish() {
  std::unique_lock<std::mutex> lock(mMutexFinish);
  mbFinishRequested = true;
}

bool Viewer::CheckFinish() {
  std::unique_lock<std::mutex> lock(mMutexFinish);
  return mbFinishRequested;
}

void Viewer::SetFinish() {
  std::unique_lock<std::mutex> lock(mMutexFinish);
  mbFinished = true;
}

bool Viewer::isFinished() {
  std::unique_lock<std::mutex> lock(mMutexFinish);
  return mbFinished;
}

void Viewer::RequestStop() {
  std::unique_lock<std::mutex> lock(mMutexStop);
  if (!mbStopped)
    mbStopRequested = true;
}

bool Viewer::isStopped() {
  std::unique_lock<std::mutex> lock(mMutexStop);
  return mbStopped;
}

bool Viewer::Stop() {
  std::unique_lock<std::mutex> lock(mMutexStop);
  if (mbStopRequested) {
    mbStopped = true;
    mbStopRequested = false;
    return true;
  }
  return false;
}

void Viewer::Release() {
  std::unique_lock<std::mutex> lock(mMutexStop);
  mbStopped = false;
}

} // namespace ORB_SLAM2
