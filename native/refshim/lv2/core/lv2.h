/* refshim/lv2/core/lv2.h — minimal LV2 core ABI, own implementation.
 *
 * Purpose: the environment has no LV2 SDK, so the upstream reference
 * PLUGIN (/root/reference/src/phaserotate.c) cannot be built against
 * the real headers.  This header declares just the lv2core surface
 * that plugin needs — LV2_Handle / LV2_Feature / LV2_Descriptor and
 * the lv2_descriptor entry point — with the layout frozen by the
 * public LV2 specification (lv2plug.in/ns/lv2core, ISC-licensed
 * spec).  Like refshim/fftw3.h these are independent declarations
 * from the spec, not copied code.  The compiled plugin is a test
 * fixture only (tests/test_ref_plugin_binary.py), never shipped.
 */
#ifndef PRT_REFSHIM_LV2_CORE_H
#define PRT_REFSHIM_LV2_CORE_H

#include <stdint.h>

#define LV2_CORE_URI "http://lv2plug.in/ns/lv2core"

#ifndef LV2_SYMBOL_EXPORT
#define LV2_SYMBOL_EXPORT __attribute__ ((visibility ("default")))
#endif

#ifdef __cplusplus
extern "C" {
#endif

typedef void* LV2_Handle;

typedef struct {
	const char* URI;
	void*       data;
} LV2_Feature;

typedef struct LV2_Descriptor {
	const char* URI;

	LV2_Handle (*instantiate) (const struct LV2_Descriptor* descriptor,
	                           double                       sample_rate,
	                           const char*                  bundle_path,
	                           const LV2_Feature* const*    features);

	void (*connect_port) (LV2_Handle instance, uint32_t port,
	                      void* data_location);

	void (*activate) (LV2_Handle instance);

	void (*run) (LV2_Handle instance, uint32_t sample_count);

	void (*deactivate) (LV2_Handle instance);

	void (*cleanup) (LV2_Handle instance);

	const void* (*extension_data) (const char* uri);
} LV2_Descriptor;

LV2_SYMBOL_EXPORT
const LV2_Descriptor* lv2_descriptor (uint32_t index);

#ifdef __cplusplus
}
#endif

#endif /* PRT_REFSHIM_LV2_CORE_H */
