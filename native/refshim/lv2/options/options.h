/* refshim/lv2/options/options.h — minimal options extension ABI, own
 * implementation from the public LV2 spec (lv2plug.in/ns/ext/options).
 * The reference plugin only reads LV2_Options_Option arrays passed as
 * an instantiate() feature (ui:scaleFactor, phaserotate.c:242-276).
 */
#ifndef PRT_REFSHIM_LV2_OPTIONS_H
#define PRT_REFSHIM_LV2_OPTIONS_H

#include <stdint.h>

#include <lv2/urid/urid.h>

#define LV2_OPTIONS_URI "http://lv2plug.in/ns/ext/options"
#define LV2_OPTIONS__options LV2_OPTIONS_URI "#options"

#ifdef __cplusplus
extern "C" {
#endif

typedef enum {
	LV2_OPTIONS_INSTANCE,
	LV2_OPTIONS_RESOURCE,
	LV2_OPTIONS_BLANK,
	LV2_OPTIONS_PORT
} LV2_Options_Context;

typedef struct {
	LV2_Options_Context context;
	uint32_t            subject;
	LV2_URID            key;
	uint32_t            size;
	LV2_URID            type;
	const void*         value;
} LV2_Options_Option;

#ifdef __cplusplus
}
#endif

#endif /* PRT_REFSHIM_LV2_OPTIONS_H */
