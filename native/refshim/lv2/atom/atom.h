/* refshim/lv2/atom/atom.h — minimal atom extension ABI, own
 * implementation from the public LV2 spec (lv2plug.in/ns/ext/atom).
 * The binary layout (8-byte aligned atoms; `size` excludes the 8-byte
 * {size,type} header) is frozen by the spec; these are independent
 * declarations, the same layout native/prt_atom.h already implements
 * for the framework's own shim.  Only the types the reference plugin
 * touches are declared (LV2_Atom, Int/Float/Bool, Event, Sequence,
 * Object, Property) plus the URI vocabulary phaserotate.h maps.
 */
#ifndef PRT_REFSHIM_LV2_ATOM_H
#define PRT_REFSHIM_LV2_ATOM_H

#include <stdint.h>

#define LV2_ATOM_URI "http://lv2plug.in/ns/ext/atom"

#define LV2_ATOM__Atom LV2_ATOM_URI "#Atom"
#define LV2_ATOM__Blank LV2_ATOM_URI "#Blank"
#define LV2_ATOM__Bool LV2_ATOM_URI "#Bool"
#define LV2_ATOM__Chunk LV2_ATOM_URI "#Chunk"
#define LV2_ATOM__Double LV2_ATOM_URI "#Double"
#define LV2_ATOM__Float LV2_ATOM_URI "#Float"
#define LV2_ATOM__Int LV2_ATOM_URI "#Int"
#define LV2_ATOM__Long LV2_ATOM_URI "#Long"
#define LV2_ATOM__Object LV2_ATOM_URI "#Object"
#define LV2_ATOM__Property LV2_ATOM_URI "#Property"
#define LV2_ATOM__Sequence LV2_ATOM_URI "#Sequence"
#define LV2_ATOM__String LV2_ATOM_URI "#String"
#define LV2_ATOM__Tuple LV2_ATOM_URI "#Tuple"
#define LV2_ATOM__URID LV2_ATOM_URI "#URID"
#define LV2_ATOM__Vector LV2_ATOM_URI "#Vector"
#define LV2_ATOM__eventTransfer LV2_ATOM_URI "#eventTransfer"

#define LV2_ATOM_REFERENCE_TYPE 0

#ifdef __cplusplus
extern "C" {
#endif

/** Any atom: size (of the body, not counting this header) + type URID. */
typedef struct {
	uint32_t size;
	uint32_t type;
} LV2_Atom;

typedef struct {
	LV2_Atom atom;
	int32_t  body;
} LV2_Atom_Int;

typedef struct {
	LV2_Atom atom;
	int64_t  body;
} LV2_Atom_Long;

typedef struct {
	LV2_Atom atom;
	float    body;
} LV2_Atom_Float;

typedef struct {
	LV2_Atom atom;
	double   body;
} LV2_Atom_Double;

typedef LV2_Atom_Int LV2_Atom_Bool;

typedef struct {
	LV2_Atom atom;
	uint32_t body;
} LV2_Atom_URID;

typedef struct {
	uint32_t id;    /**< URID of the object, or 0. */
	uint32_t otype; /**< URID of the object type. */
	/* properties (LV2_Atom_Property_Body) follow */
} LV2_Atom_Object_Body;

typedef struct {
	LV2_Atom             atom;
	LV2_Atom_Object_Body body;
} LV2_Atom_Object;

typedef struct {
	uint32_t key;     /**< Property key URID. */
	uint32_t context; /**< Context URID, or 0. */
	LV2_Atom value;   /**< Value atom header; body follows. */
} LV2_Atom_Property_Body;

typedef struct {
	LV2_Atom               atom;
	LV2_Atom_Property_Body body;
} LV2_Atom_Property;

/** One event in a sequence: a frame timestamp then an atom. */
typedef struct {
	union {
		int64_t frames;
		double  beats;
	} time;
	LV2_Atom body;
	/* body data follows */
} LV2_Atom_Event;

typedef struct {
	uint32_t unit; /**< Time-stamp unit URID, or 0 for audio frames. */
	uint32_t pad;
	/* events (LV2_Atom_Event) follow */
} LV2_Atom_Sequence_Body;

typedef struct {
	LV2_Atom               atom;
	LV2_Atom_Sequence_Body body;
} LV2_Atom_Sequence;

#ifdef __cplusplus
}
#endif

#endif /* PRT_REFSHIM_LV2_ATOM_H */
