/* refshim/lv2/urid/urid.h — minimal urid extension ABI, own
 * implementation from the public LV2 spec (lv2plug.in/ns/ext/urid).
 * See refshim/lv2/core/lv2.h for the rationale.  The host side of
 * the map (string -> uint32 table) lives in plugin_host.cc.
 */
#ifndef PRT_REFSHIM_LV2_URID_H
#define PRT_REFSHIM_LV2_URID_H

#include <stdint.h>

#define LV2_URID_URI "http://lv2plug.in/ns/ext/urid"
#define LV2_URID__map LV2_URID_URI "#map"
#define LV2_URID__unmap LV2_URID_URI "#unmap"

#ifdef __cplusplus
extern "C" {
#endif

typedef void* LV2_URID_Map_Handle;
typedef void* LV2_URID_Unmap_Handle;

typedef uint32_t LV2_URID;

typedef struct {
	LV2_URID_Map_Handle handle;
	LV2_URID (*map) (LV2_URID_Map_Handle handle, const char* uri);
} LV2_URID_Map;

typedef struct {
	LV2_URID_Unmap_Handle handle;
	const char* (*unmap) (LV2_URID_Unmap_Handle handle, LV2_URID urid);
} LV2_URID_Unmap;

#ifdef __cplusplus
}
#endif

#endif /* PRT_REFSHIM_LV2_URID_H */
