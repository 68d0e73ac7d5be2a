/* refshim/lv2/atom/forge.h — atom writer, own implementation of the
 * public LV2 atom-forge semantics: every write is padded to 8 bytes,
 * written bytes (including padding) accumulate into the size of every
 * open container frame, frames form a parent-linked stack.  Buffer
 * mode only (lv2_atom_forge_set_buffer) — the reference plugin never
 * installs a sink (phaserotate.c:797-798).  Only the functions that
 * plugin and our host harness call are provided.
 */
#ifndef PRT_REFSHIM_LV2_ATOM_FORGE_H
#define PRT_REFSHIM_LV2_ATOM_FORGE_H

#include <stdbool.h>
#include <stdint.h>
#include <string.h>

#include <lv2/atom/atom.h>
#include <lv2/atom/util.h>
#include <lv2/urid/urid.h>

#ifdef __cplusplus
extern "C" {
#endif

/** A pointer into the forge buffer (0 on overflow). */
typedef intptr_t LV2_Atom_Forge_Ref;

typedef struct LV2_Atom_Forge_Frame {
	struct LV2_Atom_Forge_Frame* parent;
	LV2_Atom_Forge_Ref           ref;
} LV2_Atom_Forge_Frame;

typedef struct {
	uint8_t* buf;
	uint32_t offset;
	uint32_t size;

	LV2_Atom_Forge_Frame* stack;

	LV2_URID Blank;
	LV2_URID Bool;
	LV2_URID Chunk;
	LV2_URID Double;
	LV2_URID Float;
	LV2_URID Int;
	LV2_URID Long;
	LV2_URID Object;
	LV2_URID Property;
	LV2_URID Sequence;
	LV2_URID String;
	LV2_URID Tuple;
	LV2_URID URID;
	LV2_URID Vector;
} LV2_Atom_Forge;

static inline void
lv2_atom_forge_init (LV2_Atom_Forge* forge, LV2_URID_Map* map)
{
	memset (forge, 0, sizeof (*forge));
	forge->Blank    = map->map (map->handle, LV2_ATOM__Blank);
	forge->Bool     = map->map (map->handle, LV2_ATOM__Bool);
	forge->Chunk    = map->map (map->handle, LV2_ATOM__Chunk);
	forge->Double   = map->map (map->handle, LV2_ATOM__Double);
	forge->Float    = map->map (map->handle, LV2_ATOM__Float);
	forge->Int      = map->map (map->handle, LV2_ATOM__Int);
	forge->Long     = map->map (map->handle, LV2_ATOM__Long);
	forge->Object   = map->map (map->handle, LV2_ATOM__Object);
	forge->Property = map->map (map->handle, LV2_ATOM__Property);
	forge->Sequence = map->map (map->handle, LV2_ATOM__Sequence);
	forge->String   = map->map (map->handle, LV2_ATOM__String);
	forge->Tuple    = map->map (map->handle, LV2_ATOM__Tuple);
	forge->URID     = map->map (map->handle, LV2_ATOM__URID);
	forge->Vector   = map->map (map->handle, LV2_ATOM__Vector);
}

static inline void
lv2_atom_forge_set_buffer (LV2_Atom_Forge* forge, uint8_t* buf,
                           size_t size)
{
	forge->buf    = buf;
	forge->size   = (uint32_t)size;
	forge->offset = 0;
	forge->stack  = NULL;
}

static inline LV2_Atom*
lv2_atom_forge_deref (LV2_Atom_Forge* forge, LV2_Atom_Forge_Ref ref)
{
	(void)forge;
	return (LV2_Atom*)ref;
}

/* Write raw bytes; the byte count accumulates into every open frame's
 * atom size (container sizes include child padding, per spec). */
static inline LV2_Atom_Forge_Ref
lv2_atom_forge_raw (LV2_Atom_Forge* forge, const void* data,
                    uint32_t size)
{
	if (forge->offset + size > forge->size) {
		return 0;
	}
	uint8_t* mem = forge->buf + forge->offset;
	forge->offset += size;
	memcpy (mem, data, size);
	for (LV2_Atom_Forge_Frame* f = forge->stack; f; f = f->parent) {
		((LV2_Atom*)f->ref)->size += size;
	}
	return (LV2_Atom_Forge_Ref)mem;
}

static inline void
lv2_atom_forge_pad (LV2_Atom_Forge* forge, uint32_t written)
{
	const uint64_t pad      = 0;
	const uint32_t pad_size = lv2_atom_pad_size (written) - written;
	if (pad_size) {
		lv2_atom_forge_raw (forge, &pad, pad_size);
	}
}

static inline LV2_Atom_Forge_Ref
lv2_atom_forge_write (LV2_Atom_Forge* forge, const void* data,
                      uint32_t size)
{
	LV2_Atom_Forge_Ref ref = lv2_atom_forge_raw (forge, data, size);
	if (ref) {
		lv2_atom_forge_pad (forge, size);
	}
	return ref;
}

static inline LV2_Atom_Forge_Ref
lv2_atom_forge_push (LV2_Atom_Forge*       forge,
                     LV2_Atom_Forge_Frame* frame,
                     LV2_Atom_Forge_Ref    ref)
{
	frame->parent = forge->stack;
	frame->ref    = ref;
	if (ref) {
		forge->stack = frame;
	}
	return ref;
}

static inline void
lv2_atom_forge_pop (LV2_Atom_Forge* forge, LV2_Atom_Forge_Frame* frame)
{
	if (frame == forge->stack) {
		forge->stack = frame->parent;
	}
}

/* -- primitives ---------------------------------------------------------- */

static inline LV2_Atom_Forge_Ref
lv2_atom_forge_primitive (LV2_Atom_Forge* forge, const LV2_Atom* a)
{
	return lv2_atom_forge_write (forge, a, lv2_atom_total_size (a));
}

static inline LV2_Atom_Forge_Ref
lv2_atom_forge_int (LV2_Atom_Forge* forge, int32_t val)
{
	const LV2_Atom_Int a = { { sizeof (int32_t), forge->Int }, val };
	return lv2_atom_forge_primitive (forge, &a.atom);
}

static inline LV2_Atom_Forge_Ref
lv2_atom_forge_long (LV2_Atom_Forge* forge, int64_t val)
{
	const LV2_Atom_Long a = { { sizeof (int64_t), forge->Long }, val };
	return lv2_atom_forge_primitive (forge, &a.atom);
}

static inline LV2_Atom_Forge_Ref
lv2_atom_forge_float (LV2_Atom_Forge* forge, float val)
{
	const LV2_Atom_Float a = { { sizeof (float), forge->Float }, val };
	return lv2_atom_forge_primitive (forge, &a.atom);
}

static inline LV2_Atom_Forge_Ref
lv2_atom_forge_bool (LV2_Atom_Forge* forge, bool val)
{
	const LV2_Atom_Bool a = { { sizeof (int32_t), forge->Bool },
	                          val ? 1 : 0 };
	return lv2_atom_forge_primitive (forge, &a.atom);
}

/* -- containers ---------------------------------------------------------- */

static inline LV2_Atom_Forge_Ref
lv2_atom_forge_sequence_head (LV2_Atom_Forge*       forge,
                              LV2_Atom_Forge_Frame* frame,
                              uint32_t              unit)
{
	const LV2_Atom_Sequence a = {
		{ (uint32_t)sizeof (LV2_Atom_Sequence_Body), forge->Sequence },
		{ unit, 0 }
	};
	return lv2_atom_forge_push (
	    forge, frame, lv2_atom_forge_write (forge, &a, sizeof (a)));
}

static inline LV2_Atom_Forge_Ref
lv2_atom_forge_frame_time (LV2_Atom_Forge* forge, int64_t frames)
{
	return lv2_atom_forge_write (forge, &frames, sizeof (frames));
}

static inline LV2_Atom_Forge_Ref
lv2_atom_forge_object (LV2_Atom_Forge*       forge,
                       LV2_Atom_Forge_Frame* frame,
                       LV2_URID              id,
                       LV2_URID              otype)
{
	const LV2_Atom_Object a = {
		{ (uint32_t)sizeof (LV2_Atom_Object_Body), forge->Object },
		{ id, otype }
	};
	return lv2_atom_forge_push (
	    forge, frame, lv2_atom_forge_write (forge, &a, sizeof (a)));
}

/* Pre-1.8 spelling; same wire layout but typed Blank. */
static inline LV2_Atom_Forge_Ref
lv2_atom_forge_blank (LV2_Atom_Forge*       forge,
                      LV2_Atom_Forge_Frame* frame,
                      uint32_t              id,
                      LV2_URID              otype)
{
	const LV2_Atom_Object a = {
		{ (uint32_t)sizeof (LV2_Atom_Object_Body), forge->Blank },
		{ id, otype }
	};
	return lv2_atom_forge_push (
	    forge, frame, lv2_atom_forge_write (forge, &a, sizeof (a)));
}

static inline LV2_Atom_Forge_Ref
lv2_atom_forge_property_head (LV2_Atom_Forge* forge, LV2_URID key,
                              LV2_URID context)
{
	const uint32_t body[2] = { key, context };
	return lv2_atom_forge_write (forge, body, sizeof (body));
}

#ifdef __cplusplus
}
#endif

#endif /* PRT_REFSHIM_LV2_ATOM_FORGE_H */
