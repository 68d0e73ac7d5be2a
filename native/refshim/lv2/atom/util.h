/* refshim/lv2/atom/util.h — atom iteration helpers, own implementation
 * of the public LV2 atom spec's documented semantics (padding to 8
 * bytes; sequences iterate LV2_Atom_Event headers; objects iterate
 * LV2_Atom_Property_Body records).  Only what the reference plugin
 * calls is provided: sequence begin/is_end/next and the varargs
 * lv2_atom_object_get query (phaserotate.c:803-830).
 */
#ifndef PRT_REFSHIM_LV2_ATOM_UTIL_H
#define PRT_REFSHIM_LV2_ATOM_UTIL_H

#include <assert.h> /* the real SDK pulls this in; phaserotate.c:541
                       uses assert() without its own include */
#include <stdarg.h>
#include <stdint.h>
#include <string.h>

#include <lv2/atom/atom.h>

#ifdef __cplusplus
extern "C" {
#endif

static inline uint32_t
lv2_atom_pad_size (uint32_t size)
{
	return (size + 7U) & ~7U;
}

static inline uint32_t
lv2_atom_total_size (const LV2_Atom* atom)
{
	return (uint32_t)sizeof (LV2_Atom) + atom->size;
}

/* -- sequence iteration ------------------------------------------------- */

static inline LV2_Atom_Event*
lv2_atom_sequence_begin (const LV2_Atom_Sequence_Body* body)
{
	return (LV2_Atom_Event*)(body + 1);
}

static inline int
lv2_atom_sequence_is_end (const LV2_Atom_Sequence_Body* body,
                          uint32_t                      size,
                          const LV2_Atom_Event*         i)
{
	return (const uint8_t*)i >= (const uint8_t*)body + lv2_atom_pad_size (size);
}

static inline LV2_Atom_Event*
lv2_atom_sequence_next (const LV2_Atom_Event* i)
{
	return (LV2_Atom_Event*)((const uint8_t*)i + sizeof (LV2_Atom_Event) +
	                         lv2_atom_pad_size (i->body.size));
}

/* -- object property iteration / query ---------------------------------- */

static inline LV2_Atom_Property_Body*
lv2_atom_object_begin (const LV2_Atom_Object_Body* body)
{
	return (LV2_Atom_Property_Body*)(body + 1);
}

static inline int
lv2_atom_object_is_end (const LV2_Atom_Object_Body*   body,
                        uint32_t                      size,
                        const LV2_Atom_Property_Body* i)
{
	return (const uint8_t*)i >= (const uint8_t*)body + size;
}

static inline LV2_Atom_Property_Body*
lv2_atom_object_next (const LV2_Atom_Property_Body* i)
{
	const LV2_Atom* value =
	    (const LV2_Atom*)((const uint8_t*)i + 2 * sizeof (uint32_t));
	return (LV2_Atom_Property_Body*)(
	    (const uint8_t*)i +
	    lv2_atom_pad_size ((uint32_t)sizeof (LV2_Atom_Property_Body) +
	                       value->size));
}

/* Query an object for (LV2_URID key, const LV2_Atom** value) pairs,
 * NULL/0-terminated.  Returns the number of requested keys NOT found
 * (the spec's documented contract). */
static inline int
lv2_atom_object_get (const LV2_Atom_Object* object, ...)
{
	int      n_queries = 0;
	int      matches   = 0;
	va_list  args;

	va_start (args, object);
	while (va_arg (args, uint32_t)) {
		if (!va_arg (args, const LV2_Atom**)) {
			va_end (args);
			return -1;
		}
		++n_queries;
	}
	va_end (args);

	for (LV2_Atom_Property_Body* p = lv2_atom_object_begin (&object->body);
	     !lv2_atom_object_is_end (&object->body, object->atom.size, p);
	     p = lv2_atom_object_next (p)) {
		va_start (args, object);
		for (int i = 0; i < n_queries; ++i) {
			uint32_t         qkey = va_arg (args, uint32_t);
			const LV2_Atom** qval = va_arg (args, const LV2_Atom**);
			if (qkey == p->key && !*qval) {
				*qval = &p->value;
				++matches;
				break;
			}
		}
		va_end (args);
	}
	return n_queries - matches;
}

#ifdef __cplusplus
}
#endif

#endif /* PRT_REFSHIM_LV2_ATOM_UTIL_H */
