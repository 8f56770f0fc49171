/* Minimal Pangolin stub: MapDrawer.h (pulled in via Optimizer.h) only
   needs the OpenGlMatrix type in method signatures; MapDrawer.cc is not
   compiled. No Pangolin exists on this host. */
#ifndef REFBENCH_PANGOLIN_STUB_H
#define REFBENCH_PANGOLIN_STUB_H
namespace pangolin {
struct OpenGlMatrix {
  double m[16];
};
}  // namespace pangolin
#endif
