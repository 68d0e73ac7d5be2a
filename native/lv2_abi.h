// Minimal LV2 core ABI declarations.
//
// The LV2 plugin C ABI is a small, frozen, publicly specified interface
// (lv2plug.in/ns/lv2core, ISC-licensed spec).  The build environment has
// no LV2 SDK installed, so the handful of types a loadable plugin binary
// needs are declared here from the specification.  Layout is fixed by the
// spec and shared by every host/plugin; this is an independent
// declaration, not copied code.

#ifndef PRT_LV2_ABI_H
#define PRT_LV2_ABI_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef void* LV2_Handle;

typedef struct {
  const char* URI;
  void* data;
} LV2_Feature;

typedef struct LV2_Descriptor {
  const char* URI;
  LV2_Handle (*instantiate)(const struct LV2_Descriptor* descriptor,
                            double sample_rate, const char* bundle_path,
                            const LV2_Feature* const* features);
  void (*connect_port)(LV2_Handle instance, uint32_t port, void* data);
  void (*activate)(LV2_Handle instance);
  void (*run)(LV2_Handle instance, uint32_t sample_count);
  void (*deactivate)(LV2_Handle instance);
  void (*cleanup)(LV2_Handle instance);
  const void* (*extension_data)(const char* uri);
} LV2_Descriptor;

#ifdef _WIN32
#define LV2_SYMBOL_EXPORT __declspec(dllexport)
#else
#define LV2_SYMBOL_EXPORT __attribute__((visibility("default")))
#endif

LV2_SYMBOL_EXPORT
const LV2_Descriptor* lv2_descriptor(uint32_t index);

#ifdef __cplusplus
}
#endif

#endif  // PRT_LV2_ABI_H
