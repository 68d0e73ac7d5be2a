/* refshim/lv2/log/logger.h — stub.  The reference plugin includes this
 * header (phaserotate.c:33/37) but uses no symbol from it (verified:
 * no lv2_log_* / LV2_Log_* reference anywhere in src/).  A minimal
 * logger struct is declared anyway so an include-only consumer stays
 * source-compatible.  Own declaration from the public LV2 spec
 * (lv2plug.in/ns/ext/log).
 */
#ifndef PRT_REFSHIM_LV2_LOGGER_H
#define PRT_REFSHIM_LV2_LOGGER_H

#include <lv2/urid/urid.h>

#define LV2_LOG_URI "http://lv2plug.in/ns/ext/log"
#define LV2_LOG__Error LV2_LOG_URI "#Error"
#define LV2_LOG__Note LV2_LOG_URI "#Note"
#define LV2_LOG__Trace LV2_LOG_URI "#Trace"
#define LV2_LOG__Warning LV2_LOG_URI "#Warning"

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
	void*    log; /* LV2_Log_Log*, unused by the reference plugin */
	LV2_URID Error;
	LV2_URID Note;
	LV2_URID Trace;
	LV2_URID Warning;
} LV2_Log_Logger;

#ifdef __cplusplus
}
#endif

#endif /* PRT_REFSHIM_LV2_LOGGER_H */
