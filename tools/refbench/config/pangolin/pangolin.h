/* Minimal Pangolin stub: MapDrawer.h (pulled in via Optimizer.h) only
   needs the OpenGlMatrix type in method signatures; MapDrawer.cc is not
   compiled. No Pangolin exists on this host. */
#ifndef REFBENCH_PANGOLIN_STUB_H
#define REFBENCH_PANGOLIN_STUB_H
#include <string>
namespace pangolin {
struct OpenGlMatrix {
  double m[16];
};
/* System::Shutdown calls this when a viewer exists; headless no-op. */
inline void BindToContext(const std::string &) {}
}  // namespace pangolin
#endif
