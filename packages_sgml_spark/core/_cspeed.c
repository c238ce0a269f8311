/* Steady-state PCDATA token executor, compiled.
 *
 * A C mirror of SGMLParser._pcdata_fast's PURE paths (parser.py:787):
 * whole-tag memo replay, whole-entity replay, PCDATA span append,
 * plus inline CR handling (putchar/add_cdata collapse).  Anything the
 * Python executor marks impure (open_element fallback, gripes, empty
 * elements, state switches it can't finish) makes this executor STOP
 * BEFORE CONSUMING THE TOKEN and return to Python, whose general loop
 * re-processes the token with full semantics — so output (text,
 * errors, DOM, positions) is byte-identical to the pure-Python path
 * by construction, and the differential suite in
 * tests/test_cspeed.py enforces it.
 *
 * Reference semantics mirrored (via parser.py, itself cited to
 * /root/reference/parser.c): putchar_dtd_parser S_PCDATA branch
 * (parser.c:4847+), add_cdata CR/LF dance (parser.c:4758-4797),
 * open_element push branch (parser.c:2895-3014), one-level
 * omitted-close (parser.c:2962-2996 + 2818-2848), emit space modes
 * (parser.c:4312-4374).
 *
 * Object model: Python Element/State objects are interned into
 * integer-indexed registries (identity-based, strong refs).
 * Transition / same-state / omitted-path results are cached in C hash
 * maps keyed by (state_idx, elem_idx); misses call back into
 * model.make_dtd_transition / same_state / find_omitted_path, which
 * memoize Python-side too, keeping both views identical.  The tag and
 * entity replay maps shadow dtd._tag_memo / dtd._ent_fast lazily.
 * The per-DTD dtd._omit_gen list is the invalidation generation:
 * when it moves, this ctx's registries are dropped and rebuilt from
 * live objects (per-DTD so one DTD's flips don't flush another's
 * warm ctx — cspeed.ctx_for passes each ctx its own DTD's list).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <string.h>

/* ---------------------------------------------------------------- */
/* small open-addressing maps                                        */
/* ---------------------------------------------------------------- */

typedef struct {
    uint64_t *keys;     /* key 0 = empty slot; callers bias keys +1 */
    int64_t *vals;
    size_t cap, n;
} U64Map;

static void u64map_init(U64Map *m) { m->keys = NULL; m->vals = NULL; m->cap = 0; m->n = 0; }
static void u64map_free(U64Map *m) { free(m->keys); free(m->vals); u64map_init(m); }

static int u64map_grow(U64Map *m)
{
    size_t ncap = m->cap ? m->cap * 2 : 64;
    uint64_t *nk = calloc(ncap, sizeof(uint64_t));
    int64_t *nv = malloc(ncap * sizeof(int64_t));
    if (!nk || !nv) { free(nk); free(nv); return -1; }
    for (size_t i = 0; i < m->cap; i++) {
        if (!m->keys[i]) continue;
        uint64_t h = m->keys[i] * 0x9E3779B97F4A7C15ULL;
        size_t j = h & (ncap - 1);
        while (nk[j]) j = (j + 1) & (ncap - 1);
        nk[j] = m->keys[i]; nv[j] = m->vals[i];
    }
    free(m->keys); free(m->vals);
    m->keys = nk; m->vals = nv; m->cap = ncap;
    return 0;
}

static int u64map_put(U64Map *m, uint64_t key, int64_t val)
{
    key += 1;
    if (m->n * 4 >= m->cap * 3 && u64map_grow(m) < 0) return -1;
    uint64_t h = key * 0x9E3779B97F4A7C15ULL;
    size_t j = h & (m->cap - 1);
    while (m->keys[j] && m->keys[j] != key) j = (j + 1) & (m->cap - 1);
    if (!m->keys[j]) { m->keys[j] = key; m->n++; }
    m->vals[j] = val;
    return 0;
}

/* returns 1 if found */
static int u64map_get(const U64Map *m, uint64_t key, int64_t *out)
{
    if (!m->cap) return 0;
    key += 1;
    uint64_t h = key * 0x9E3779B97F4A7C15ULL;
    size_t j = h & (m->cap - 1);
    while (m->keys[j]) {
        if (m->keys[j] == key) { *out = m->vals[j]; return 1; }
        j = (j + 1) & (m->cap - 1);
    }
    return 0;
}

/* byte-string keyed map (tag decls, entity names)                   */

typedef struct {
    char *key; size_t klen;
    int64_t val;
} SEnt;

typedef struct {
    SEnt *slots;        /* key NULL = empty */
    size_t cap, n;
} StrMap;

static void strmap_init(StrMap *m) { m->slots = NULL; m->cap = 0; m->n = 0; }
static void strmap_free(StrMap *m)
{
    for (size_t i = 0; i < m->cap; i++) free(m->slots[i].key);
    free(m->slots);
    strmap_init(m);
}

static uint64_t strhash(const char *s, size_t n)
{
    uint64_t h = 0xCBF29CE484222325ULL;
    for (size_t i = 0; i < n; i++) { h ^= (unsigned char)s[i]; h *= 0x100000001B3ULL; }
    return h ? h : 1;
}

static int strmap_grow(StrMap *m)
{
    size_t ncap = m->cap ? m->cap * 2 : 64;
    SEnt *ns = calloc(ncap, sizeof(SEnt));
    if (!ns) return -1;
    for (size_t i = 0; i < m->cap; i++) {
        if (!m->slots[i].key) continue;
        size_t j = strhash(m->slots[i].key, m->slots[i].klen) & (ncap - 1);
        while (ns[j].key) j = (j + 1) & (ncap - 1);
        ns[j] = m->slots[i];
    }
    free(m->slots);
    m->slots = ns; m->cap = ncap;
    return 0;
}

static int strmap_put(StrMap *m, const char *key, size_t klen, int64_t val)
{
    if (m->n * 4 >= m->cap * 3 && strmap_grow(m) < 0) return -1;
    size_t j = strhash(key, klen) & (m->cap - 1);
    while (m->slots[j].key &&
           (m->slots[j].klen != klen || memcmp(m->slots[j].key, key, klen)))
        j = (j + 1) & (m->cap - 1);
    if (!m->slots[j].key) {
        m->slots[j].key = malloc(klen ? klen : 1);
        if (!m->slots[j].key) return -1;
        memcpy(m->slots[j].key, key, klen);
        m->slots[j].klen = klen;
        m->n++;
    }
    m->slots[j].val = val;
    return 0;
}

static int strmap_get(const StrMap *m, const char *key, size_t klen, int64_t *out)
{
    if (!m->cap) return 0;
    size_t j = strhash(key, klen) & (m->cap - 1);
    while (m->slots[j].key) {
        if (m->slots[j].klen == klen && !memcmp(m->slots[j].key, key, klen)) {
            *out = m->slots[j].val;
            return 1;
        }
        j = (j + 1) & (m->cap - 1);
    }
    return 0;
}

/* ---------------------------------------------------------------- */
/* registries                                                        */
/* ---------------------------------------------------------------- */

typedef struct {
    PyObject *obj;          /* Element (strong ref) */
    PyObject *name;         /* element name str (strong) */
    char undefined, has_struct, omit_close, has_map;
    int stype;              /* structure.type or -1 */
    int initial;            /* state idx, -1 = None, -2 = unresolved */
    int final_;             /* state idx, -1 = None, -2 = unresolved */
} CElem;

typedef struct {
    PyObject *obj;          /* State (strong ref) */
} CState;

/* tag memo entry, packed into StrMap val:
 * bits 0-1: kind (1 = 'b', 2 = 'e'); bit 2: empty_el; bit 3: conref;
 * bits 8-11: update_space_mode outcome + 2 (0 = bail, 1 = no-op,
 * 2+ = space mode value + 2 — see cspeed._space_flag);
 * bits 16-39: elem idx; bits 40+: tag_objs idx + 1 (0 = none —
 * the memo entry tuple itself, kept for tape-mode begin events) */
#define TAG_KIND(v)   ((int)((v) & 3))
#define TAG_EMPTY(v)  ((int)(((v) >> 2) & 1))
#define TAG_CONREF(v) ((int)(((v) >> 3) & 1))
#define TAG_SPACE(v)  ((int)(((v) >> 8) & 15) - 2)
#define TAG_EIDX(v)   ((int)(((v) >> 16) & 0xFFFFFF))
#define TAG_TIDX(v)   ((int)((v) >> 40))

typedef struct {
    PyObject *s;            /* replacement text (strong) */
    int kind;               /* 0 numeric, 1 one-char, 2 EC_CDATA text */
    int is_blank;           /* kind 0/1: is_blank_char(s) */
} CEntity;

/* value-independent begin-tag shape (dtd._shape_memo): same element
 * + same attr names in the same order, values parsed per occurrence
 * (parser.process_begin_element registers; only declared CDATA attrs
 * qualify, so a verbatim quoted-value slice equals the full path) */
typedef struct {
    PyObject *e;            /* Element (strong) */
    PyObject *attrs;        /* tuple of Attr objects (strong) */
    PyObject *defaults;     /* tuple of (Attr, default) pairs (strong) */
    PyObject *guards;       /* tuple of attr-NAME strings (strong):
                             * implicit attrs on a shared DTD that
                             * DtdCow rolls back per document; replay
                             * only while e.find_attribute(name)
                             * succeeds (string-memo _guard_ok
                             * semantics) — else bail so the full
                             * path re-creates + re-gripes cold */
    unsigned long long guard_gen;   /* sess_counter of last
                                     * successful guard validation
                                     * (attrs never vanish mid-parse,
                                     * so one check per session) */
    int eidx;
    int n_attrs;
    int sflag;              /* update_space_mode outcome (never -2) */
} CShape;

typedef struct {
    PyObject_HEAD
    /* constants (from Python at init) */
    int S_PCDATA, S_CDATA, S_RCDATA;
    int SP_STRICT, SP_SGML, SP_DEFAULT, SP_REMOVE, SP_PRESERVE;
    int C_EMPTY, C_CDATA, C_RCDATA, C_ANY;
    int MT_PCDATA, MT_ELEMENT;
    /* callbacks (strong refs) */
    PyObject *make_dtd_transition, *same_state, *find_omitted_path,
             *make_state_engine, *omit_gen_list, *env_class,
             *cdata_element, *space_flag, *allow_gen_list;
    PyObject *dtd;          /* owning DTD (strong) */
    long gen;               /* registered OMIT_GEN value */
    long allow_gen;         /* registered ALLOW_GEN value (flushes
                             * only the allow map: DtdCow flip-only
                             * rollbacks invalidate just it) */
    /* registries */
    CElem *elems; size_t n_elems, cap_elems;
    CState *states; size_t n_states, cap_states;
    U64Map elem_ids;        /* id(Element) -> idx */
    U64Map state_ids;       /* id(State) -> idx */
    U64Map trans;           /* (sidx<<24|eidx) -> sidx | -1 (None) */
    U64Map same;            /* (sidx<<24|final_sidx) -> 0/1 */
    U64Map omit;            /* (sidx<<24|eidx) -> 0/1 (path non-empty) */
    U64Map allow;           /* (p_eidx<<24|c_eidx) -> 1: child present
                             * in undefined parent's allow_for group
                             * (positives only; negatives flip after
                             * Python handles the first occurrence) */
    StrMap tags;            /* decl bytes -> packed tag entry */
    StrMap ents;            /* name bytes -> index into ent_vals */
    StrMap shapes;          /* "name\0attr\0attr" -> shape_vals idx */
    CShape *shape_vals; size_t n_shapes, cap_shapes;
    unsigned long long sess_counter;    /* bumped per sess_build;
                                         * keys shape guard caching */
    PyObject *parse_error;  /* errors.ParseError class (strong) */
    PyObject *sev_warning;  /* errors.WARNING value (strong) */
    CEntity *ent_vals; size_t n_ents, cap_ents;
    PyObject **tag_objs;    /* memo entry tuples (strong), tape mode */
    size_t n_tag_objs, cap_tag_objs;
    /* interned attr names */
    PyObject *s_environments, *s_cdata, *s_line, *s_linepos, *s_charpos,
        *s_blank_cdata, *s_cdata_must_be_empty, *s_first, *s_startloc,
        *s_startcdata, *s_state, *s_cdata_state, *s_etag, *s_map,
        *s_text_parts, *s_element, *s_space_mode, *s_cdata_memo,
        *s_structure, *s_undefined, *s_type, *s_omit_close,
        *s_initial_state, *s_final_state, *s_name, *s__tag_memo,
        *s__ent_fast, *s__c_tape, *s_content, *s_group,
        *s__shape_memo, *s_case_sensitive,
        *s_find_attribute, *s_errors, *s_quiet, *s_shorttag;
} CtxObject;

#define CDATA_EIDX 0        /* CDATA_ELEMENT is always element 0 */

static void ctx_flush(CtxObject *c)
{
    for (size_t i = 0; i < c->n_elems; i++) {
        Py_XDECREF(c->elems[i].obj);
        Py_XDECREF(c->elems[i].name);
    }
    for (size_t i = 0; i < c->n_states; i++)
        Py_XDECREF(c->states[i].obj);
    for (size_t i = 0; i < c->n_ents; i++)
        Py_XDECREF(c->ent_vals[i].s);
    for (size_t i = 0; i < c->n_shapes; i++) {
        Py_XDECREF(c->shape_vals[i].e);
        Py_XDECREF(c->shape_vals[i].attrs);
        Py_XDECREF(c->shape_vals[i].defaults);
        Py_XDECREF(c->shape_vals[i].guards);
    }
    free(c->shape_vals); c->shape_vals = NULL;
    c->n_shapes = c->cap_shapes = 0;
    strmap_free(&c->shapes);
    for (size_t i = 0; i < c->n_tag_objs; i++)
        Py_XDECREF(c->tag_objs[i]);
    free(c->tag_objs); c->tag_objs = NULL;
    c->n_tag_objs = c->cap_tag_objs = 0;
    free(c->elems); c->elems = NULL; c->n_elems = c->cap_elems = 0;
    free(c->states); c->states = NULL; c->n_states = c->cap_states = 0;
    free(c->ent_vals); c->ent_vals = NULL; c->n_ents = c->cap_ents = 0;
    u64map_free(&c->elem_ids);
    u64map_free(&c->state_ids);
    u64map_free(&c->trans);
    u64map_free(&c->same);
    u64map_free(&c->omit);
    u64map_free(&c->allow);
    strmap_free(&c->tags);
    strmap_free(&c->ents);
}

static void Ctx_dealloc(CtxObject *c)
{
    ctx_flush(c);
    Py_XDECREF(c->make_dtd_transition);
    Py_XDECREF(c->same_state);
    Py_XDECREF(c->find_omitted_path);
    Py_XDECREF(c->make_state_engine);
    Py_XDECREF(c->omit_gen_list);
    Py_XDECREF(c->allow_gen_list);
    Py_XDECREF(c->env_class);
    Py_XDECREF(c->cdata_element);
    Py_XDECREF(c->space_flag);
    Py_XDECREF(c->dtd);
    Py_XDECREF(c->s_environments); Py_XDECREF(c->s_cdata);
    Py_XDECREF(c->s_line); Py_XDECREF(c->s_linepos); Py_XDECREF(c->s_charpos);
    Py_XDECREF(c->s_blank_cdata); Py_XDECREF(c->s_cdata_must_be_empty);
    Py_XDECREF(c->s_first); Py_XDECREF(c->s_startloc); Py_XDECREF(c->s_startcdata);
    Py_XDECREF(c->s_state); Py_XDECREF(c->s_cdata_state); Py_XDECREF(c->s_etag);
    Py_XDECREF(c->s_map); Py_XDECREF(c->s_text_parts); Py_XDECREF(c->s_element);
    Py_XDECREF(c->s_space_mode); Py_XDECREF(c->s_cdata_memo);
    Py_XDECREF(c->s_structure); Py_XDECREF(c->s_undefined); Py_XDECREF(c->s_type);
    Py_XDECREF(c->s_omit_close); Py_XDECREF(c->s_initial_state);
    Py_XDECREF(c->s_final_state); Py_XDECREF(c->s_name);
    Py_XDECREF(c->s__tag_memo); Py_XDECREF(c->s__ent_fast);
    Py_XDECREF(c->s__c_tape);
    Py_XDECREF(c->s_content); Py_XDECREF(c->s_group);
    Py_XDECREF(c->s__shape_memo); Py_XDECREF(c->s_case_sensitive);
    Py_XDECREF(c->s_find_attribute); Py_XDECREF(c->s_errors);
    Py_XDECREF(c->s_quiet); Py_XDECREF(c->s_shorttag);
    Py_XDECREF(c->parse_error); Py_XDECREF(c->sev_warning);
    PyObject_Del(c);
}

static PyTypeObject Ctx_Type = {
    PyVarObject_HEAD_INIT(NULL, 0)
    .tp_name = "_sgml_cspeed.Ctx",
    .tp_basicsize = sizeof(CtxObject),
    .tp_dealloc = (destructor)Ctx_dealloc,
    .tp_flags = Py_TPFLAGS_DEFAULT,
};

/* register a State, return idx (or -1 on error) */
static int reg_state(CtxObject *c, PyObject *st)
{
    int64_t idx;
    if (u64map_get(&c->state_ids, (uint64_t)(uintptr_t)st, &idx))
        return (int)idx;
    if (c->n_states >= c->cap_states) {
        size_t ncap = c->cap_states ? c->cap_states * 2 : 64;
        CState *ns = realloc(c->states, ncap * sizeof(CState));
        if (!ns) { PyErr_NoMemory(); return -1; }
        c->states = ns; c->cap_states = ncap;
    }
    Py_INCREF(st);
    c->states[c->n_states].obj = st;
    if (u64map_put(&c->state_ids, (uint64_t)(uintptr_t)st,
                   (int64_t)c->n_states) < 0) {
        PyErr_NoMemory(); return -1;
    }
    return (int)c->n_states++;
}

/* refresh the cached flags of elems[idx] from the live object */
static int elem_read_flags(CtxObject *c, int idx)
{
    CElem *ce = &c->elems[idx];
    PyObject *e = ce->obj;
    if (e == c->cdata_element) {          /* sentinel: fixed flags */
        ce->undefined = 0; ce->has_struct = 0; ce->stype = -1;
        ce->omit_close = 0; ce->has_map = 0;
        ce->initial = -1; ce->final_ = -1;
        return 0;
    }
    PyObject *u = PyObject_GetAttr(e, c->s_undefined);
    if (!u) return -1;
    ce->undefined = PyObject_IsTrue(u); Py_DECREF(u);
    PyObject *st = PyObject_GetAttr(e, c->s_structure);
    if (!st) return -1;
    if (st == Py_None) {
        ce->has_struct = 0; ce->stype = -1; ce->omit_close = 0;
        ce->initial = -1; ce->final_ = -1;
    } else {
        ce->has_struct = 1;
        PyObject *t = PyObject_GetAttr(st, c->s_type);
        if (!t) { Py_DECREF(st); return -1; }
        ce->stype = (int)PyLong_AsLong(t); Py_DECREF(t);
        PyObject *oc = PyObject_GetAttr(st, c->s_omit_close);
        if (!oc) { Py_DECREF(st); return -1; }
        ce->omit_close = PyObject_IsTrue(oc); Py_DECREF(oc);
        ce->initial = -2; ce->final_ = -2;   /* resolve lazily */
    }
    Py_DECREF(st);
    PyObject *mp = PyObject_GetAttr(e, c->s_map);
    if (!mp) return -1;
    ce->has_map = (mp != Py_None); Py_DECREF(mp);
    return 0;
}

static int reg_elem(CtxObject *c, PyObject *e)
{
    int64_t idx;
    if (u64map_get(&c->elem_ids, (uint64_t)(uintptr_t)e, &idx))
        return (int)idx;
    if (c->n_elems >= c->cap_elems) {
        size_t ncap = c->cap_elems ? c->cap_elems * 2 : 64;
        CElem *ne = realloc(c->elems, ncap * sizeof(CElem));
        if (!ne) { PyErr_NoMemory(); return -1; }
        c->elems = ne; c->cap_elems = ncap;
    }
    int i = (int)c->n_elems;
    memset(&c->elems[i], 0, sizeof(CElem));
    Py_INCREF(e);
    c->elems[i].obj = e;
    if (e != c->cdata_element) {
        PyObject *nm = PyObject_GetAttr(e, c->s_name);
        if (!nm) { Py_DECREF(e); c->elems[i].obj = NULL; return -1; }
        c->elems[i].name = nm;
    }
    c->n_elems++;
    if (elem_read_flags(c, i) < 0) return -1;
    if (u64map_put(&c->elem_ids, (uint64_t)(uintptr_t)e, i) < 0) {
        PyErr_NoMemory(); return -1;
    }
    return i;
}

/* resolve initial/final state of a DEFINED element (cached).
 * Returns 0 ok, -1 error.  For undefined elements callers must use
 * elem_engine_live(). */
static int elem_resolve_engine(CtxObject *c, int eidx)
{
    CElem *ce = &c->elems[eidx];
    if (ce->initial != -2) return 0;
    PyObject *init = PyObject_CallFunctionObjArgs(
        c->make_state_engine, ce->obj, NULL);
    if (!init) return -1;
    if (init == Py_None) ce->initial = -1;
    else {
        ce->initial = reg_state(c, init);
        if (ce->initial < 0) { Py_DECREF(init); return -1; }
    }
    Py_DECREF(init);
    /* final_state read fresh after engine build */
    PyObject *st = PyObject_GetAttr(ce->obj, c->s_structure);
    if (!st) return -1;
    if (st == Py_None) ce->final_ = -1;
    else {
        PyObject *f = PyObject_GetAttr(st, c->s_final_state);
        if (!f) { Py_DECREF(st); return -1; }
        if (f == Py_None) ce->final_ = -1;
        else {
            ce->final_ = reg_state(c, f);
            if (ce->final_ < 0) { Py_DECREF(f); Py_DECREF(st); return -1; }
        }
        Py_DECREF(f);
    }
    Py_DECREF(st);
    return 0;
}

#define TKEY(sidx, eidx) (((uint64_t)(sidx) << 24) | (uint64_t)(eidx))

/* transition (state idx, elem idx) -> state idx, -1 = None, -9 = error */
static int trans_get(CtxObject *c, int sidx, int eidx)
{
    int64_t v;
    if (u64map_get(&c->trans, TKEY(sidx, eidx), &v)) return (int)v;
    PyObject *r = PyObject_CallFunctionObjArgs(
        c->make_dtd_transition, c->states[sidx].obj, c->elems[eidx].obj,
        NULL);
    if (!r) return -9;
    int res;
    if (r == Py_None) res = -1;
    else {
        res = reg_state(c, r);
        if (res < 0) { Py_DECREF(r); return -9; }
    }
    Py_DECREF(r);
    if (u64map_put(&c->trans, TKEY(sidx, eidx), res) < 0) {
        PyErr_NoMemory(); return -9;
    }
    return res;
}

/* same_state(final, here) -> 0/1, -9 = error */
static int same_get(CtxObject *c, int here, int final_)
{
    int64_t v;
    if (u64map_get(&c->same, TKEY(here, final_), &v)) return (int)v;
    PyObject *r = PyObject_CallFunctionObjArgs(
        c->same_state, c->states[final_].obj, c->states[here].obj, NULL);
    if (!r) return -9;
    int res = PyObject_IsTrue(r);
    Py_DECREF(r);
    if (res < 0) return -9;
    if (u64map_put(&c->same, TKEY(here, final_), res) < 0) {
        PyErr_NoMemory(); return -9;
    }
    return res;
}

/* Is `child` (c_eidx; CDATA_EIDX for #PCDATA) already a member of
 * the UNDEFINED parent's allow_for group (parser.c:2851-2890)?
 * If so, open_element's undefined branch is a pure push with no
 * state change and no gripes, so the executor may take it.  The
 * FIRST occurrence of a (parent, child) pair always misses here and
 * bails to Python, whose allow_for performs the append — only then
 * do we cache the positive (membership never shrinks; declarations
 * that replace the structure bump OMIT_GEN, which flushes this map
 * with the rest of the registries).  Returns 1/0, -9 = error. */
static int allow_member(CtxObject *c, int p_eidx, int c_eidx)
{
    int64_t v;
    if (u64map_get(&c->allow, TKEY(p_eidx, c_eidx), &v)) return 1;
    PyObject *st = PyObject_GetAttr(c->elems[p_eidx].obj,
                                    c->s_structure);
    if (!st) return -9;
    if (st == Py_None) { Py_DECREF(st); return 0; }
    PyObject *content = PyObject_GetAttr(st, c->s_content);
    Py_DECREF(st);
    if (!content) return -9;
    if (content == Py_None) { Py_DECREF(content); return 0; }
    PyObject *group = PyObject_GetAttr(content, c->s_group);
    Py_DECREF(content);
    if (!group) return -9;
    if (!PyList_Check(group)) { Py_DECREF(group); return 0; }
    PyObject *child = c->elems[c_eidx].obj;
    int found = 0;
    for (Py_ssize_t k = 0; k < PyList_GET_SIZE(group) && !found; k++) {
        PyObject *m = PyList_GET_ITEM(group, k);    /* borrowed */
        PyObject *t = PyObject_GetAttr(m, c->s_type);
        if (!t) { Py_DECREF(group); return -9; }
        long ty = PyLong_AsLong(t);
        Py_DECREF(t);
        if (ty == -1 && PyErr_Occurred()) { Py_DECREF(group); return -9; }
        if (c_eidx == CDATA_EIDX) {
            if (ty == c->MT_PCDATA) found = 1;
        } else if (ty == c->MT_ELEMENT) {
            PyObject *me = PyObject_GetAttr(m, c->s_element);
            if (!me) { Py_DECREF(group); return -9; }
            if (me == child) found = 1;
            Py_DECREF(me);
        }
    }
    Py_DECREF(group);
    if (found && u64map_put(&c->allow, TKEY(p_eidx, c_eidx), 1) < 0) {
        PyErr_NoMemory(); return -9;
    }
    return found;
}

/* find_omitted_path(state, e) non-empty? -> 0/1, -9 = error */
static int omit_get(CtxObject *c, int sidx, int eidx)
{
    int64_t v;
    if (u64map_get(&c->omit, TKEY(sidx, eidx), &v)) return (int)v;
    PyObject *r = PyObject_CallFunctionObjArgs(
        c->find_omitted_path, c->states[sidx].obj, c->elems[eidx].obj,
        NULL);
    if (!r) return -9;
    int res = (r != Py_None) && PyObject_IsTrue(r);
    Py_DECREF(r);
    if (u64map_put(&c->omit, TKEY(sidx, eidx), res) < 0) {
        PyErr_NoMemory(); return -9;
    }
    return res;
}

/* probe dtd._tag_memo for a decl; register on hit.
 * Returns 1 hit (entry in *out), 0 miss, -1 error. */
static int tag_probe(CtxObject *c, const char *decl, Py_ssize_t dlen,
                     int64_t *out)
{
    if (strmap_get(&c->tags, decl, dlen, out)) return *out != 0;
    PyObject *memo = PyObject_GetAttr(c->dtd, c->s__tag_memo);
    if (!memo) return -1;
    if (memo == Py_None) { Py_DECREF(memo); return 0; }
    PyObject *key = PyUnicode_DecodeLatin1(decl, dlen, NULL);
    if (!key) { Py_DECREF(memo); return -1; }
    PyObject *entry = PyDict_GetItemWithError(memo, key);  /* borrowed */
    Py_DECREF(key);
    Py_DECREF(memo);
    if (!entry) {
        if (PyErr_Occurred()) return -1;
        /* negative-cache NOT stored: the general loop will fill the
         * Python memo and we re-probe next time */
        return 0;
    }
    /* entry: ('b', e, atts, empty, conref) | ('e', e).  Guarded
     * begin entries (6-tuples carrying griped implicit attrs; see
     * parser.process_begin_element) need a per-replay attr-presence
     * check the executor doesn't do — treat them as a miss (no
     * negative cache: the guard outcome is per-document). */
    PyObject *k0 = PyTuple_GET_ITEM(entry, 0);
    PyObject *eobj = PyTuple_GET_ITEM(entry, 1);
    Py_ssize_t esz = PyTuple_GET_SIZE(entry);
    Py_UCS4 kc = PyUnicode_ReadChar(k0, 0);
    int kind;
    if (kc == 'b' && esz == 5) kind = 1;
    else if (kc == 'e' && esz == 2) kind = 2;
    else return 0;
    int eidx = reg_elem(c, eobj);
    if (eidx < 0) return -1;
    int empty = 0, conref = 0, sflag = -1;
    size_t tidx1 = 0;       /* tag_objs idx + 1; 0 = none */
    if (kind == 1) {
        empty = PyObject_IsTrue(PyTuple_GET_ITEM(entry, 3));
        conref = PyObject_IsTrue(PyTuple_GET_ITEM(entry, 4));
        PyObject *sf = PyObject_CallFunctionObjArgs(
            c->space_flag, entry, NULL);
        if (!sf) return -1;
        sflag = (int)PyLong_AsLong(sf);
        Py_DECREF(sf);
        if (sflag == -1 && PyErr_Occurred()) return -1;
        /* keep the memo entry itself: tape-mode begin events hand
         * (e, atts) back to Python's _emit_begin */
        if (c->n_tag_objs >= c->cap_tag_objs) {
            size_t ncap = c->cap_tag_objs ? c->cap_tag_objs * 2 : 64;
            PyObject **nt = realloc(c->tag_objs,
                                    ncap * sizeof(PyObject *));
            if (!nt) { PyErr_NoMemory(); return -1; }
            c->tag_objs = nt; c->cap_tag_objs = ncap;
        }
        Py_INCREF(entry);
        c->tag_objs[c->n_tag_objs] = entry;
        tidx1 = ++c->n_tag_objs;
    }
    if (eidx > 0xFFFFFF || tidx1 > 0x3FFFFF)
        return 0;           /* unpackable (never in practice): miss */
    int64_t packed = (int64_t)kind | ((int64_t)empty << 2) |
                     ((int64_t)conref << 3) |
                     ((int64_t)(sflag + 2) << 8) |
                     ((int64_t)eidx << 16) |
                     ((int64_t)tidx1 << 40);
    if (strmap_put(&c->tags, decl, dlen, packed) < 0) {
        PyErr_NoMemory(); return -1;
    }
    *out = packed;
    return 1;
}

/* probe dtd._ent_fast; returns index into ent_vals, -2 miss, -1 err */
static int ent_probe(CtxObject *c, const char *name, Py_ssize_t nlen)
{
    int64_t v;
    if (strmap_get(&c->ents, name, nlen, &v)) return (int)v;
    PyObject *fast = PyObject_GetAttr(c->dtd, c->s__ent_fast);
    if (!fast) return -1;
    if (fast == Py_None) { Py_DECREF(fast); return -2; }
    PyObject *key = PyUnicode_DecodeLatin1(name, nlen, NULL);
    if (!key) { Py_DECREF(fast); return -1; }
    PyObject *entry = PyDict_GetItemWithError(fast, key);
    Py_DECREF(key);
    Py_DECREF(fast);
    if (!entry) {
        if (PyErr_Occurred()) return -1;
        return -2;
    }
    PyObject *s = PyTuple_GET_ITEM(entry, 0);
    long kind = PyLong_AsLong(PyTuple_GET_ITEM(entry, 1));
    if (c->n_ents >= c->cap_ents) {
        size_t ncap = c->cap_ents ? c->cap_ents * 2 : 64;
        CEntity *ne = realloc(c->ent_vals, ncap * sizeof(CEntity));
        if (!ne) { PyErr_NoMemory(); return -1; }
        c->ent_vals = ne; c->cap_ents = ncap;
    }
    int idx = (int)c->n_ents;
    Py_INCREF(s);
    c->ent_vals[idx].s = s;
    c->ent_vals[idx].kind = (int)kind;
    int isb = 0;
    if (kind != 2 && PyUnicode_GET_LENGTH(s) == 1) {
        Py_UCS4 ch = PyUnicode_ReadChar(s, 0);
        /* is_blank_char: <=255 -> {9,10,13,32}; >255 -> isspace */
        isb = (ch <= 255) ? (ch == 9 || ch == 10 || ch == 13 || ch == 32)
                          : Py_UNICODE_ISSPACE(ch);
    }
    c->ent_vals[idx].is_blank = isb;
    c->n_ents++;
    if (strmap_put(&c->ents, name, nlen, idx) < 0) {
        PyErr_NoMemory(); return -1;
    }
    return idx;
}

/* ---------------------------------------------------------------- */
/* cdata buffer (UCS4)                                               */
/* ---------------------------------------------------------------- */

typedef struct {
    Py_UCS4 *d;
    size_t n, cap;
    int maxchar_gt_ff;      /* any char > 0xFF present */
    int maxchar_gt_7f;      /* any char > 0x7F present */
} Buf;

static int buf_reserve(Buf *b, size_t extra)
{
    if (b->n + extra <= b->cap) return 0;
    size_t ncap = b->cap ? b->cap : 256;
    while (ncap < b->n + extra) ncap *= 2;
    Py_UCS4 *nd = realloc(b->d, ncap * sizeof(Py_UCS4));
    if (!nd) { PyErr_NoMemory(); return -1; }
    b->d = nd; b->cap = ncap;
    return 0;
}

static inline int buf_push(Buf *b, Py_UCS4 ch)
{
    if (b->n >= b->cap && buf_reserve(b, 1) < 0) return -1;
    b->d[b->n++] = ch;
    if (ch > 0x7F) { b->maxchar_gt_7f = 1; if (ch > 0xFF) b->maxchar_gt_ff = 1; }
    return 0;
}

static int buf_push_span(Buf *b, const Py_UCS1 *s, size_t n)
{
    if (buf_reserve(b, n) < 0) return -1;
    for (size_t i = 0; i < n; i++) {
        Py_UCS4 ch = s[i];
        b->d[b->n + i] = ch;
        if (ch > 0x7F) b->maxchar_gt_7f = 1;
    }
    b->n += n;
    return 0;
}

/* ---------------------------------------------------------------- */
/* emit helpers: space-mode transform of a UCS4 string               */
/* ---------------------------------------------------------------- */

static inline int is_blank4(Py_UCS4 ch)
{
    if (ch <= 255) return ch == 9 || ch == 10 || ch == 13 || ch == 32;
    return Py_UNICODE_ISSPACE(ch) ? 1 : 0;
}

/* mirrors parser.collapse_blanks (parser.py:3305) on a UCS4 slice,
 * in place into out (caller provides >= n capacity); returns new len */
static size_t c_collapse(const Py_UCS4 *s, size_t n, int ascii_only,
                         int trim, Py_UCS4 *out)
{
    size_t m = 0;
    if (ascii_only) {
        /* regex [ \t\r\n]+ -> ' ' (no trim here; strip after) */
        size_t i = 0;
        while (i < n) {
            Py_UCS4 ch = s[i];
            if (ch == ' ' || ch == '\t' || ch == '\r' || ch == '\n') {
                out[m++] = ' ';
                while (i < n && (s[i] == ' ' || s[i] == '\t' ||
                                 s[i] == '\r' || s[i] == '\n'))
                    i++;
            } else {
                out[m++] = ch;
                i++;
            }
        }
        if (trim) {
            /* strip(' \t\r\n') — after collapse only ' ' remains of
             * the run chars, but strip the full set for parity */
            size_t a = 0, b = m;
            while (a < b && (out[a] == ' ' || out[a] == '\t' ||
                             out[a] == '\r' || out[a] == '\n')) a++;
            while (b > a && (out[b-1] == ' ' || out[b-1] == '\t' ||
                             out[b-1] == '\r' || out[b-1] == '\n')) b--;
            memmove(out, out + a, (b - a) * sizeof(Py_UCS4));
            m = b - a;
        }
        return m;
    }
    /* non-ascii path: per-char is_blank_char squeeze */
    int run = 0;
    for (size_t i = 0; i < n; i++) {
        Py_UCS4 ch = s[i];
        if (is_blank4(ch)) { run = 1; continue; }
        if (run && m) out[m++] = ' ';
        else if (run && !m && !trim) out[m++] = ' ';
        run = 0;
        out[m++] = ch;
    }
    if (run && !trim) out[m++] = ' ';
    if (trim) {
        /* out.strip(): full Unicode whitespace strip */
        size_t a = 0, b = m;
        while (a < b && Py_UNICODE_ISSPACE(out[a])) a++;
        while (b > a && Py_UNICODE_ISSPACE(out[b-1])) b--;
        memmove(out, out + a, (b - a) * sizeof(Py_UCS4));
        m = b - a;
    }
    return m;
}

/* apply emit_cdata's space-mode transform (parser.py:2042-2063).
 * Returns a NEW PyUnicode (or NULL+error), sets *empty if result "".
 * scratch must hold n UCS4. */
static PyObject *emit_transform(CtxObject *c, const Py_UCS4 *s, size_t n,
                                int ascii_only, int sm, int first,
                                int last, Py_UCS4 *scratch, int *empty)
{
    size_t a = 0, b = n;
    if (sm == c->SP_SGML || sm == c->SP_DEFAULT) {
        if (first) {
            if (b > a && s[a] == '\r') a++;
            if (b > a && s[a] == '\n') a++;
        }
        if (last && b > a) {
            if (s[b-1] == '\n') b--;
            if (b > a && s[b-1] == '\r') b--;
        }
        if (sm == c->SP_DEFAULT) {
            size_t m = c_collapse(s + a, b - a, ascii_only, 0, scratch);
            *empty = (m == 0);
            return PyUnicode_FromKindAndData(PyUnicode_4BYTE_KIND,
                                             scratch, (Py_ssize_t)m);
        }
        *empty = (b == a);
        return PyUnicode_FromKindAndData(PyUnicode_4BYTE_KIND,
                                         s + a, (Py_ssize_t)(b - a));
    }
    if (sm == c->SP_REMOVE) {
        size_t m = c_collapse(s, n, ascii_only, 1, scratch);
        *empty = (m == 0);
        return PyUnicode_FromKindAndData(PyUnicode_4BYTE_KIND,
                                         scratch, (Py_ssize_t)m);
    }
    /* SP_PRESERVE / SP_STRICT: verbatim */
    *empty = (n == 0);
    return PyUnicode_FromKindAndData(PyUnicode_4BYTE_KIND, s,
                                     (Py_ssize_t)n);
}

/* ---------------------------------------------------------------- */
/* session: mirrors of the parser's mutable state                    */
/* ---------------------------------------------------------------- */

#define MAX_DEPTH 192

typedef struct {
    int eidx;
    int sidx;               /* -1 = None */
    int space_mode;
    PyObject *map;          /* borrowed (owner: py env/elem); NULL = None */
    int cm_in, cm_out;      /* cdata_memo state idxs, -1 = None */
    PyObject *py_env;       /* borrowed from envs list; NULL = C-created */
    char dirty;             /* py env needs .state / .cdata_memo writeback */
} CEnv;

typedef struct {
    CtxObject *c;
    PyObject *parser;
    PyObject *envs_list;    /* borrowed */
    PyObject *text_parts;   /* borrowed; NULL in tape mode */
    PyObject *tape;         /* borrowed event list; NULL in sink mode */
    CEnv env[MAX_DEPTH];
    int depth;
    int orig_depth;         /* python list len at entry */
    int survive;            /* envs[0..survive) untouched prefix */
    long line, linepos, charpos;
    int first, blank_cdata, cmbe;
    int fold;               /* dtd.case_sensitive == False */
    int shorttag;           /* dtd.shorttag (unquoted '/' breaks) */
    int quiet;              /* parser.quiet (gripes don't append) */
    Buf cdata;
    Py_UCS4 *scratch; size_t scratch_cap;
    /* pending writeback values */
    long startloc_l, startloc_p, startloc_c; int startloc_dirty;
    long startcd_l, startcd_p, startcd_c; int startcd_dirty;
    /* tape mode: the positions Python's executor would expose at the
     * event sinks for the CURRENT tag token — startloc points at the
     * '<', charpos is already past the '>' (parser.py:925-937) */
    long ev_sl_l, ev_sl_p, ev_sl_c, ev_cp;
} Sess;

static int sess_scratch(Sess *S, size_t n)
{
    if (S->scratch_cap >= n) return 0;
    size_t ncap = S->scratch_cap ? S->scratch_cap : 256;
    while (ncap < n) ncap *= 2;
    Py_UCS4 *ns = realloc(S->scratch, ncap * sizeof(Py_UCS4));
    if (!ns) { PyErr_NoMemory(); return -1; }
    S->scratch = ns; S->scratch_cap = ncap;
    return 0;
}

static long get_long_attr(PyObject *o, PyObject *name, int *err)
{
    PyObject *v = PyObject_GetAttr(o, name);
    if (!v) { *err = 1; return 0; }
    long r = PyLong_AsLong(v);
    Py_DECREF(v);
    if (r == -1 && PyErr_Occurred()) { *err = 1; return 0; }
    return r;
}

static int get_bool_attr(PyObject *o, PyObject *name, int *err)
{
    PyObject *v = PyObject_GetAttr(o, name);
    if (!v) { *err = 1; return 0; }
    int r = PyObject_IsTrue(v);
    Py_DECREF(v);
    if (r < 0) { *err = 1; return 0; }
    return r;
}

/* returns 0 ok, 1 not-applicable (caller falls back), -1 error */
static int sess_build(Sess *S, CtxObject *c, PyObject *parser,
                      int tape_mode)
{
    int err = 0;
    S->c = c;
    S->parser = parser;
    S->tape = NULL;
    S->cdata.d = NULL; S->cdata.n = 0; S->cdata.cap = 0;
    S->cdata.maxchar_gt_ff = 0; S->cdata.maxchar_gt_7f = 0;
    S->scratch = NULL; S->scratch_cap = 0;
    S->startloc_dirty = 0; S->startcd_dirty = 0;

    /* generation check */
    PyObject *g = PyList_GetItem(c->omit_gen_list, 0);   /* borrowed */
    if (!g) return -1;
    long gen = PyLong_AsLong(g);
    if (gen != c->gen) {
        ctx_flush(c);
        c->gen = gen;
        /* re-register the CDATA sentinel as element 0 */
        if (reg_elem(c, c->cdata_element) != CDATA_EIDX) return -1;
    }
    g = PyList_GetItem(c->allow_gen_list, 0);            /* borrowed */
    if (!g) return -1;
    long agen = PyLong_AsLong(g);
    if (agen != c->allow_gen) {
        u64map_free(&c->allow);
        c->allow_gen = agen;
    }
    /* bounded-growth guard: flip-created states (undefined-element
     * engines, one-ish per soup document) are registered with strong
     * refs but flip-only rollbacks deliberately do NOT bump OMIT_GEN
     * — without a cap a long-lived worker accrues them forever
     * (~380 B/doc measured).  A full flush every few thousand
     * registrations amortizes to noise and every registry refills
     * lazily. */
    if (c->n_states > 4096 || c->n_tag_objs > 16384 ||
        c->n_elems > 4096) {
        ctx_flush(c);
        if (reg_elem(c, c->cdata_element) != CDATA_EIDX) return -1;
    }

    S->line = get_long_attr(parser, c->s_line, &err);
    S->linepos = get_long_attr(parser, c->s_linepos, &err);
    S->charpos = get_long_attr(parser, c->s_charpos, &err);
    S->first = get_bool_attr(parser, c->s_first, &err);
    S->blank_cdata = get_bool_attr(parser, c->s_blank_cdata, &err);
    S->cmbe = get_bool_attr(parser, c->s_cdata_must_be_empty, &err);
    S->fold = !get_bool_attr(c->dtd, c->s_case_sensitive, &err);
    S->shorttag = get_bool_attr(c->dtd, c->s_shorttag, &err);
    S->quiet = get_bool_attr(parser, c->s_quiet, &err);
    if (err) return -1;
    c->sess_counter++;      /* invalidates per-parse shape-guard
                             * validations from earlier sessions */

    PyObject *envs = PyObject_GetAttr(parser, c->s_environments);
    if (!envs) return -1;
    Py_DECREF(envs);                    /* parser keeps it alive */
    S->envs_list = envs;
    Py_ssize_t nd = PyList_Size(envs);
    if (nd < 0) return -1;
    if (nd >= MAX_DEPTH) return 1;
    S->depth = (int)nd;
    S->orig_depth = (int)nd;
    S->survive = (int)nd;
    for (Py_ssize_t i = 0; i < nd; i++) {
        PyObject *pe = PyList_GET_ITEM(envs, i);    /* borrowed */
        CEnv *E = &S->env[i];
        E->py_env = pe;
        E->dirty = 0;
        PyObject *el = PyObject_GetAttr(pe, c->s_element);
        if (!el) return -1;
        E->eidx = reg_elem(c, el);
        Py_DECREF(el);
        if (E->eidx < 0) return -1;
        PyObject *st = PyObject_GetAttr(pe, c->s_state);
        if (!st) return -1;
        if (st == Py_None) E->sidx = -1;
        else {
            E->sidx = reg_state(c, st);
            if (E->sidx < 0) { Py_DECREF(st); return -1; }
        }
        Py_DECREF(st);
        E->space_mode = (int)get_long_attr(pe, c->s_space_mode, &err);
        if (err) return -1;
        PyObject *mp = PyObject_GetAttr(pe, c->s_map);
        if (!mp) return -1;
        E->map = (mp == Py_None) ? NULL : mp;
        Py_DECREF(mp);                  /* borrowed via env */
        PyObject *cm = PyObject_GetAttr(pe, c->s_cdata_memo);
        if (!cm) return -1;
        E->cm_in = E->cm_out = -1;
        if (cm != Py_None) {
            PyObject *a = PyTuple_GET_ITEM(cm, 0);
            PyObject *b = PyTuple_GET_ITEM(cm, 1);
            E->cm_in = reg_state(c, a);
            E->cm_out = reg_state(c, b);
            if (E->cm_in < 0 || E->cm_out < 0) { Py_DECREF(cm); return -1; }
        }
        Py_DECREF(cm);
    }

    /* cdata: list of single chars (invariant of all append sites) */
    PyObject *cd = PyObject_GetAttr(parser, c->s_cdata);
    if (!cd) return -1;
    Py_DECREF(cd);
    Py_ssize_t nc = PyList_Size(cd);
    if (nc < 0) return -1;
    if (nc && buf_reserve(&S->cdata, (size_t)nc) < 0) return -1;
    for (Py_ssize_t i = 0; i < nc; i++) {
        PyObject *it = PyList_GET_ITEM(cd, i);
        if (!PyUnicode_Check(it) || PyUnicode_GET_LENGTH(it) != 1)
            return 1;                   /* exotic buffer: fall back */
        if (buf_push(&S->cdata, PyUnicode_ReadChar(it, 0)) < 0)
            return -1;
    }

    if (tape_mode) {
        S->text_parts = NULL;
        PyObject *tl = PyObject_GetAttr(parser, c->s__c_tape);
        if (!tl) return -1;
        Py_DECREF(tl);                  /* parser keeps it alive */
        S->tape = tl;
        /* startcdata must stay event-accurate for tape data events
         * (ev_data spans, parser.py:399-409): seed from the parser
         * and let the append sites maintain it exactly as Python
         * does.  Sink mode never reads it (data_spans unread). */
        PyObject *scd = PyObject_GetAttr(parser, c->s_startcdata);
        if (!scd) return -1;
        if (!PyTuple_Check(scd) || PyTuple_GET_SIZE(scd) != 3) {
            Py_DECREF(scd);
            return 1;
        }
        S->startcd_l = PyLong_AsLong(PyTuple_GET_ITEM(scd, 0));
        S->startcd_p = PyLong_AsLong(PyTuple_GET_ITEM(scd, 1));
        S->startcd_c = PyLong_AsLong(PyTuple_GET_ITEM(scd, 2));
        Py_DECREF(scd);
        if (PyErr_Occurred()) return -1;
    } else {
        PyObject *tp = PyObject_GetAttr(parser, c->s_text_parts);
        if (!tp) return -1;
        Py_DECREF(tp);
        S->text_parts = tp;
    }
    return 0;
}

/* tape-mode data event sink (else: direct text_parts append).
 * Mirrors the values Python's fast executor would expose at its
 * self.ev_data("cdata", s) call: startcdata as maintained by the
 * append sites, startloc/charpos of the current tag token. */
static int sink_emit(Sess *S, PyObject *s)
{
    if (!S->tape)
        return PyList_Append(S->text_parts, s);
    PyObject *ev = Py_BuildValue(
        "(sO(lll)(lll)l)", "d", s,
        S->startcd_l, S->startcd_p, S->startcd_c,
        S->ev_sl_l, S->ev_sl_p, S->ev_sl_c, S->ev_cp);
    if (!ev) return -1;
    int r = PyList_Append(S->tape, ev);
    Py_DECREF(ev);
    return r;
}

/* tape begin event: the memo entry carries (e, atts) for Python's
 * _emit_begin; positions are the current tag's (parser.py:2502-2519
 * reads self.startloc / self.charpos for elem_spans + positions) */
static int tape_begin(Sess *S, PyObject *entry)
{
    if (!S->tape) return 0;
    PyObject *ev = Py_BuildValue("(sO(lll)l)", "b", entry,
                                 S->ev_sl_l, S->ev_sl_p, S->ev_sl_c,
                                 S->ev_cp);
    if (!ev) return -1;
    int r = PyList_Append(S->tape, ev);
    Py_DECREF(ev);
    return r;
}

/* tape end event: ev_end(name) reads no positions */
static int tape_end(Sess *S, PyObject *name)
{
    if (!S->tape) return 0;
    PyObject *ev = Py_BuildValue("(sO)", "e", name);
    if (!ev) return -1;
    int r = PyList_Append(S->tape, ev);
    Py_DECREF(ev);
    return r;
}

static int set_long_attr(PyObject *o, PyObject *name, long v)
{
    PyObject *pv = PyLong_FromLong(v);
    if (!pv) return -1;
    int r = PyObject_SetAttr(o, name, pv);
    Py_DECREF(pv);
    return r;
}

static int set_bool_attr(PyObject *o, PyObject *name, int v)
{
    return PyObject_SetAttr(o, name, v ? Py_True : Py_False);
}

/* write the session back into the parser.  extra_state: -1 = leave
 * parser.state alone, else set state+cdata_state (CDATA switch),
 * with etag = elems[etag_eidx].name.  new_map: map to install
 * (NULL = set None only if map_dirty). */
static int sess_writeback(Sess *S, int extra_state, int etag_eidx,
                          PyObject *new_map, int map_dirty)
{
    CtxObject *c = S->c;
    PyObject *p = S->parser;
    if (set_long_attr(p, c->s_line, S->line) < 0) return -1;
    if (set_long_attr(p, c->s_linepos, S->linepos) < 0) return -1;
    if (set_long_attr(p, c->s_charpos, S->charpos) < 0) return -1;
    if (set_bool_attr(p, c->s_first, S->first) < 0) return -1;
    if (set_bool_attr(p, c->s_blank_cdata, S->blank_cdata) < 0) return -1;
    if (set_bool_attr(p, c->s_cdata_must_be_empty, S->cmbe) < 0) return -1;
    if (S->startloc_dirty) {
        PyObject *t = Py_BuildValue("(lll)", S->startloc_l,
                                    S->startloc_p, S->startloc_c);
        if (!t) return -1;
        int r = PyObject_SetAttr(p, c->s_startloc, t);
        Py_DECREF(t);
        if (r < 0) return -1;
    }
    if (S->startcd_dirty) {
        PyObject *t = Py_BuildValue("(lll)", S->startcd_l,
                                    S->startcd_p, S->startcd_c);
        if (!t) return -1;
        int r = PyObject_SetAttr(p, c->s_startcdata, t);
        Py_DECREF(t);
        if (r < 0) return -1;
    }

    /* env stack: truncate dead python envs, then append C-created */
    if (S->survive < S->orig_depth) {
        if (PyList_SetSlice(S->envs_list, S->survive, S->orig_depth,
                            NULL) < 0)
            return -1;
    }
    for (int i = 0; i < S->depth; i++) {
        CEnv *E = &S->env[i];
        if (E->py_env) {
            if (E->dirty) {
                PyObject *st = (E->sidx >= 0)
                    ? c->states[E->sidx].obj : Py_None;
                if (PyObject_SetAttr(E->py_env, c->s_state, st) < 0)
                    return -1;
                PyObject *cm;
                if (E->cm_in >= 0) {
                    cm = PyTuple_Pack(2, c->states[E->cm_in].obj,
                                      c->states[E->cm_out].obj);
                    if (!cm) return -1;
                } else {
                    cm = Py_None; Py_INCREF(cm);
                }
                int r = PyObject_SetAttr(E->py_env, c->s_cdata_memo, cm);
                Py_DECREF(cm);
                if (r < 0) return -1;
            }
            continue;
        }
        /* materialize a new Environment */
        PyObject *env = PyObject_CallFunctionObjArgs(
            c->env_class, c->elems[E->eidx].obj, NULL);
        if (!env) return -1;
        PyObject *st = (E->sidx >= 0) ? c->states[E->sidx].obj : Py_None;
        if (PyObject_SetAttr(env, c->s_state, st) < 0 ||
            set_long_attr(env, c->s_space_mode, E->space_mode) < 0 ||
            PyObject_SetAttr(env, c->s_map,
                             E->map ? E->map : Py_None) < 0) {
            Py_DECREF(env);
            return -1;
        }
        if (E->cm_in >= 0) {
            PyObject *cm = PyTuple_Pack(2, c->states[E->cm_in].obj,
                                        c->states[E->cm_out].obj);
            if (!cm || PyObject_SetAttr(env, c->s_cdata_memo, cm) < 0) {
                Py_XDECREF(cm); Py_DECREF(env); return -1;
            }
            Py_DECREF(cm);
        }
        int r = PyList_Append(S->envs_list, env);
        Py_DECREF(env);
        if (r < 0) return -1;
        E->py_env = PyList_GET_ITEM(S->envs_list,
                                    PyList_Size(S->envs_list) - 1);
        E->dirty = 0;
    }

    /* cdata list: single-char strings */
    PyObject *cd = PyList_New((Py_ssize_t)S->cdata.n);
    if (!cd) return -1;
    for (size_t i = 0; i < S->cdata.n; i++) {
        PyObject *ch = PyUnicode_FromOrdinal((int)S->cdata.d[i]);
        if (!ch) { Py_DECREF(cd); return -1; }
        PyList_SET_ITEM(cd, (Py_ssize_t)i, ch);
    }
    int r = PyObject_SetAttr(p, c->s_cdata, cd);
    Py_DECREF(cd);
    if (r < 0) return -1;

    if (map_dirty) {
        if (PyObject_SetAttr(p, c->s_map,
                             new_map ? new_map : Py_None) < 0)
            return -1;
    }
    if (extra_state >= 0) {
        if (set_long_attr(p, c->s_state, extra_state) < 0) return -1;
        if (set_long_attr(p, c->s_cdata_state, extra_state) < 0)
            return -1;
        if (etag_eidx >= 0) {
            if (PyObject_SetAttr(p, c->s_etag,
                                 c->elems[etag_eidx].name) < 0)
                return -1;
        }
    }
    return 0;
}

static void sess_free(Sess *S)
{
    free(S->cdata.d);
    free(S->scratch);
}

/* ---------------------------------------------------------------- */
/* emit: flush the cdata buffer per emit_cdata-inline semantics.
 * last: 1 for close-tag flush, 0 for open-tag flush.
 * env may be NULL (no environments).
 * Returns: 0 emitted-or-empty, 1 WOULD GRIPE (caller must bail
 * without consuming), -1 error.
 * On success the buffer is reset and blank/cmbe flags updated.
 * commit==0 runs all checks but mutates nothing (dry run); in both
 * modes *post_sidx (if non-NULL) receives the env state after the
 * flush (the blank-#PCDATA branch advances it) — the end-tag
 * validation runs against THIS state (parser.py:1187-1207 order). */
static int emit_flush(Sess *S, CEnv *env, int last, int commit,
                      int *post_sidx)
{
    if (post_sidx) *post_sidx = env ? env->sidx : -1;
    CtxObject *c = S->c;
    if (!S->cdata.n) return 0;
    int sm = env ? env->space_mode : -1000;
    int empty = 0;
    PyObject *s = NULL;
    if (env) {
        if (sess_scratch(S, S->cdata.n) < 0) return -1;
        s = emit_transform(c, S->cdata.d, S->cdata.n,
                           !S->cdata.maxchar_gt_7f, sm, S->first, last,
                           S->scratch, &empty);
    } else {
        empty = 0;
        s = PyUnicode_FromKindAndData(PyUnicode_4BYTE_KIND, S->cdata.d,
                                      (Py_ssize_t)S->cdata.n);
    }
    if (!s) return -1;
    if (empty) {
        Py_DECREF(s);
        if (commit) {
            S->cdata.n = 0;
            S->cdata.maxchar_gt_7f = S->cdata.maxchar_gt_ff = 0;
            S->blank_cdata = 1;
            S->cmbe = 0;
        }
        return 0;
    }
    if (!S->blank_cdata) {
        if (S->cmbe) { Py_DECREF(s); return 1; }    /* would gripe */
        if (!commit) { Py_DECREF(s); return 0; }
        int r = sink_emit(S, s);
        Py_DECREF(s);
        if (r < 0) return -1;
    } else if (env) {
        /* blank cdata becoming visible: needs a #PCDATA transition */
        int bnew = (env->sidx >= 0)
            ? trans_get(c, env->sidx, CDATA_EIDX) : -1;
        if (bnew == -9) { Py_DECREF(s); return -1; }
        if (bnew >= 0) {
            if (post_sidx) *post_sidx = bnew;
            if (!commit) { Py_DECREF(s); return 0; }
            env->sidx = bnew;
            env->dirty = env->py_env != NULL;
            int r = sink_emit(S, s);
            Py_DECREF(s);
            if (r < 0) return -1;
        } else {
            /* blank cdata with no #PCDATA transition: Python emits
             * it anyway when the top element is UNDEFINED under
             * PRESERVE/STRICT space (emit_cdata's undefined branch).
             * The undefined-ness MUST be read live here: the CElem
             * flag is registration-time stale by design (fresh
             * Elements default undefined=False, the def_element flip
             * is DtdCow-journaled per parse and deliberately does
             * not flush the registry) and this is the one consumer
             * where a stale flag fails OPEN in either direction —
             * blanks dropped that Python emits (r8 warm-sweep bug:
             * reachable once the implied close lets end tags commit
             * with pending blanks under soup stacks), or emitted
             * that Python drops (gripe-pushed element, never
             * def_element'd).  Rare path (blank + preserve/strict +
             * no transition), so the GetAttr is cheap. */
            int undef = 0;
            if (env->space_mode == c->SP_PRESERVE ||
                env->space_mode == c->SP_STRICT) {
                PyObject *u = PyObject_GetAttr(
                    c->elems[env->eidx].obj, c->s_undefined);
                if (!u) { Py_DECREF(s); return -1; }
                undef = PyObject_IsTrue(u);
                Py_DECREF(u);
                if (undef < 0) { Py_DECREF(s); return -1; }
            }
            if (undef) {
                if (!commit) { Py_DECREF(s); return 0; }
                int r = sink_emit(S, s);
                Py_DECREF(s);
                if (r < 0) return -1;
            } else {
                Py_DECREF(s);       /* dropped silently (no event) */
                if (!commit) return 0;
            }
        }
    } else {
        Py_DECREF(s);
        if (!commit) return 0;
    }
    if (commit) {
        S->cdata.n = 0;
        S->cdata.maxchar_gt_7f = S->cdata.maxchar_gt_ff = 0;
        S->blank_cdata = 1;
        S->cmbe = 0;
    }
    return 0;
}

/* validation check of env against its element's final state.
 * Returns 1 ok (complete), 0 would-gripe, -1 error. */
static int check_complete(Sess *S, CEnv *env)
{
    CtxObject *c = S->c;
    CElem *ce = &c->elems[env->eidx];
    if (ce->undefined || !ce->has_struct || ce->stype == c->C_ANY)
        return 1;
    if (elem_resolve_engine(c, env->eidx) < 0) return -1;
    if (ce->final_ < 0) return 1;       /* final None -> no check */
    if (env->sidx < 0) return 0;
    if (env->sidx == ce->final_) return 1;
    int r = same_get(c, env->sidx, ce->final_);
    if (r == -9) return -1;
    return r;
}

/* --------------------------------------------------------------
 * <br>-shape implied close (r8).
 *
 * A defined C_EMPTY element (<br>/<img>/<hr>/<meta> in the HTML
 * DTDs) has NO self-closing event: it stays on the stack until the
 * next token forces the close through open_element's omit-close
 * walk / close_element's unwind / pop_to (parser.py:3219-3235).
 * Its engine is None (env sidx -1), so every following token used
 * to bail the executor — real crawl HTML round-tripped to Python
 * once per <br>.  The helpers below commit that single silent pop
 * in C when (and only when) the incoming token resolves DIRECTLY
 * one level up, which is exactly the one pop Python's walk would
 * take; anything deeper stays a pre-commit bail.
 * -------------------------------------------------------------- */

/* top env is a defined, omit-closable, complete C_EMPTY element.
 * 1 = yes, 0 = no, -1 = error. */
static int empty_top_closable(CtxObject *c, Sess *S)
{
    if (S->depth < 2) return 0;
    CEnv *tenv = &S->env[S->depth - 1];
    CElem *tp = &c->elems[tenv->eidx];
    if (!tp->has_struct || tp->undefined ||
        tp->stype != c->C_EMPTY || !tp->omit_close)
        return 0;
    /* pop_to validates completeness; C_EMPTY is always complete
     * (engine None -> final_ -1) but mirror the check exactly */
    int okc = check_complete(S, tenv);
    if (okc < 0) return -1;
    if (!okc) return 0;
    /* pop restores the parent's shortref map; identical maps (both
     * NULL inside an executor session) make it a no-op */
    return S->env[S->depth - 2].map == tenv->map;
}

/* the committed pop itself: ev_end(name) + depth--, pop_to
 * semantics (silent: caller verified omit_close + completeness +
 * no pending cdata via the prepare guard) */
static int implied_close_empty_top(CtxObject *c, Sess *S)
{
    CEnv *tenv = &S->env[S->depth - 1];
    if (tape_end(S, c->elems[tenv->eidx].name) < 0) return -1;
    S->first = 0;
    S->depth--;
    if (S->depth < S->survive) S->survive = S->depth;
    return 0;
}

/* #PCDATA open on env — cdata_memo probe, undefined-parent allow,
 * fresh transition (parser.open_element's CDATA paths).  1 = opened
 * (sidx advanced, cmbe cleared), 0 = cannot (no mutation), -1 = err.
 * as_top=0 when env is reached through the omit-close walk (the
 * implied-close-of-<br> path): open_element applies the
 * undefined-parent allow_for branch ONLY to the env that is top at
 * entry — mid-walk envs get make_dtd_transition alone (soup
 * differential caught the allow-branch leaking a silent open where
 * Python gripes "#PCDATA not allowed here"). */
static int pcdata_open(CtxObject *c, Sess *S, CEnv *env, int as_top)
{
    CElem *pe = &c->elems[env->eidx];
    /* the cdata_memo of an UNDEFINED env caches the allow_for no-op
     * (open_element's undefined-parent branch memoizes (state,
     * state)) — top-only semantics exactly like the allow branch
     * itself, so a mid-walk probe must skip it (extended soup sweep:
     * <undefined><img>x silently opened "x" through the no-op memo
     * where Python's walk gripes '#PCDATA not allowed here').  A
     * DEFINED env's memo caches a real make_dtd_transition — walk-
     * legal at any position.  CRITICAL: the undefined/has_struct
     * flags cached on CElem can be STALE-DEFINED within a parse
     * (fresh Elements default undefined=False; the def_element flip
     * is DtdCow-journaled and deliberately does not flush the
     * registry) — every pre-existing path fails CLOSED on that
     * combination because has_struct is 0, so the mid-walk cm gate
     * must require the FULL trans-branch condition, not just
     * !undefined (second extended-sweep bug: the stale flag let the
     * no-op memo through). */
    if ((as_top || (!pe->undefined && pe->has_struct &&
                    pe->stype != c->C_ANY)) &&
        env->cm_in >= 0 && env->cm_in == env->sidx) {
        env->sidx = env->cm_out;
        env->dirty = env->py_env != NULL;
        S->cmbe = 0;
        return 1;
    }
    if (pe->undefined && pe->has_struct) {
        if (!as_top) return 0;
        int am = allow_member(c, env->eidx, CDATA_EIDX);
        if (am == -9) return -1;
        if (am) { S->cmbe = 0; return 1; }
        return 0;
    }
    if (!pe->undefined && pe->has_struct && pe->stype != c->C_ANY &&
        env->sidx >= 0) {
        int new_s = trans_get(c, env->sidx, CDATA_EIDX);
        if (new_s == -9) return -1;
        if (new_s >= 0) {
            env->cm_in = env->sidx;
            env->cm_out = new_s;
            env->sidx = new_s;
            env->dirty = env->py_env != NULL;
            S->cmbe = 0;
            return 1;
        }
    }
    return 0;
}

/* ------------------------------------------------------------------
 * Shape fast path: value-independent begin-tag replay.
 *
 * Tags whose attribute VALUES are unique per occurrence (every real
 * <a href=...>) can never hit the string-keyed tag memo.  Python's
 * full path registers their SHAPE (element name + attr names, in
 * order) in dtd._shape_memo when every explicit attr is a declared
 * CDATA attr; the executor then parses the values itself — for
 * declared CDATA attrs a quoted value without [&<\t\r\n] or
 * non-ASCII is the verbatim slice the full path would produce
 * (expand_entities_attr fast path), so replay is exact.
 * ---------------------------------------------------------------- */

#define MAX_SHAPE_ATTRS 16
#define SHAPE_KEY_MAX 512

static int shape_namec(Py_UCS1 x)
{
    return ((x >= 'a' && x <= 'z') || (x >= 'A' && x <= 'Z') ||
            (x >= '0' && x <= '9') || x == '-' || x == '.' ||
            x == '_' || x == ':');
}

/* Scan decl; on a simple shape, build the folded key in kbuf and
 * record value spans.  Returns n_attrs >= 1, or 0 (not simple).
 * allow_unquoted: non-XML dialects may take unquoted values
 * (reference itake_unquoted, parser.c:1163-1198): chars up to blank
 * or decl end, verbatim, no entity expansion.  A value that is not
 * entirely ASCII name chars makes Python's get_attribute_value emit
 * the per-occurrence "Attribute value requires quotes" warning —
 * those values still scan, with the attr's bit set in *gripe_mask
 * so the commit site replays the warning (parser._rq_gripes
 * registration tolerance).  In XML dialects any unquoted value
 * gripes at tokenization (S_VAL0) with different semantics, so the
 * scanner bails there; under shorttag '/' terminates the value
 * (and triggers NET at the tokenizer), so '/' bails too. */
static int shape_scan(const Py_UCS1 *d, Py_ssize_t dlen, int fold,
                      int allow_unquoted, int shorttag,
                      char *kbuf, size_t *klen_out,
                      Py_ssize_t *vstart, Py_ssize_t *vlen,
                      unsigned int *gripe_mask)
{
    size_t kn = 0;
    Py_ssize_t p = 0;
    if (p >= dlen) return 0;
    Py_UCS1 x = d[p];
    if (!((x >= 'a' && x <= 'z') || (x >= 'A' && x <= 'Z'))) return 0;
    while (p < dlen && shape_namec(d[p])) {
        if (kn >= SHAPE_KEY_MAX - 1) return 0;
        Py_UCS1 ch = d[p++];
        kbuf[kn++] = (char)(fold && ch >= 'A' && ch <= 'Z'
                            ? ch + 32 : ch);
    }
    int na = 0;
    for (;;) {
        /* layout between attrs: blanks only (a '-' could open a
         * --comment--: bail to Python) */
        int sp = 0;
        while (p < dlen && (d[p] == ' ' || d[p] == '\t' ||
                            d[p] == '\r' || d[p] == '\n')) { p++; sp++; }
        if (p >= dlen) break;
        if (!sp) return 0;              /* junk directly after value */
        x = d[p];
        if (!((x >= 'a' && x <= 'z') || (x >= 'A' && x <= 'Z')))
            return 0;                   /* '-', '/', digit-start... */
        if (na >= MAX_SHAPE_ATTRS) return 0;
        size_t name_start = kn;
        if (kn >= SHAPE_KEY_MAX - 2) return 0;
        kbuf[kn++] = '\0';
        while (p < dlen && shape_namec(d[p])) {
            if (kn >= SHAPE_KEY_MAX - 1) return 0;
            Py_UCS1 ch = d[p++];
            kbuf[kn++] = (char)(fold && ch >= 'A' && ch <= 'Z'
                                ? ch + 32 : ch);
        }
        /* duplicate attr names: Python appends twice; bail */
        {
            size_t q = 0;
            /* compare against earlier names (segments after '\0') */
            size_t seg = 0;
            while (seg < name_start) {
                while (seg < name_start && kbuf[seg] != '\0') seg++;
                if (seg >= name_start) break;
                seg++;                       /* segment start */
                size_t e0 = seg;
                while (e0 < name_start && kbuf[e0] != '\0') e0++;
                if (e0 - seg == kn - name_start - 1 &&
                    memcmp(kbuf + seg, kbuf + name_start + 1,
                           e0 - seg) == 0)
                    return 0;
                seg = e0;
            }
            (void)q;
        }
        while (p < dlen && (d[p] == ' ' || d[p] == '\t' ||
                            d[p] == '\r' || d[p] == '\n')) p++;
        if (p >= dlen || d[p] != '=') return 0;   /* shorthand: bail */
        p++;
        while (p < dlen && (d[p] == ' ' || d[p] == '\t' ||
                            d[p] == '\r' || d[p] == '\n')) p++;
        if (p >= dlen) return 0;
        Py_UCS1 q = d[p];
        if (q != '"' && q != '\'') {
            /* unquoted value (itake_unquoted): consume to blank or
             * decl end.  Quotes inside bail (the whole-tag matcher
             * treats them as quote-region openers), >= 0x80 bails
             * (utf8 decode), '/' bails under shorttag (NET).  A
             * non-name-token value sets the gripe bit. */
            if (!allow_unquoted) return 0;
            Py_ssize_t vs = p;
            int pure = 1;
            while (p < dlen) {
                Py_UCS1 v = d[p];
                if (v == ' ' || v == '\t' || v == '\r' || v == '\n')
                    break;
                if (v >= 0x80 || v == '"' || v == '\'')
                    return 0;
                if (shorttag && v == '/')
                    return 0;
                if (!shape_namec(v))
                    pure = 0;
                p++;
            }
            if (p == vs) return 0;                /* empty / junk */
            if (!pure)
                *gripe_mask |= (1u << na);
            vstart[na] = vs;
            vlen[na] = p - vs;
            na++;
            continue;
        }
        p++;
        Py_ssize_t vs = p;
        while (p < dlen && d[p] != q) {
            Py_UCS1 v = d[p];
            if (v == '&' || v == '<' || v == '\t' || v == '\r' ||
                v == '\n' || v >= 0x80)
                return 0;       /* needs full value processing */
            p++;
        }
        if (p >= dlen) return 0;
        vstart[na] = vs;
        vlen[na] = p - vs;
        na++;
        p++;                                      /* closing quote */
    }
    if (!na) return 0;          /* attr-less tags use the string memo */
    *klen_out = kn;
    return na;
}

/* Probe/register the shape registry for a scanned key.
 * Returns shape idx, -2 miss, -1 error. */
static int shape_probe(CtxObject *c, const char *key, size_t klen)
{
    int64_t v;
    if (strmap_get(&c->shapes, key, (Py_ssize_t)klen, &v))
        return (int)v;
    PyObject *memo = PyObject_GetAttr(c->dtd, c->s__shape_memo);
    if (!memo) return -1;
    if (!PyDict_Check(memo)) { Py_DECREF(memo); return -2; }
    PyObject *k = PyUnicode_DecodeLatin1(key, (Py_ssize_t)klen, NULL);
    if (!k) { Py_DECREF(memo); return -1; }
    PyObject *entry = PyDict_GetItemWithError(memo, k);  /* borrowed */
    Py_DECREF(k);
    Py_DECREF(memo);
    if (!entry) {
        if (PyErr_Occurred()) return -1;
        return -2;      /* no negative cache: Python registers once */
    }
    if (!PyTuple_Check(entry) || PyTuple_GET_SIZE(entry) != 5)
        return -2;
    PyObject *e = PyTuple_GET_ITEM(entry, 0);
    PyObject *attrs = PyTuple_GET_ITEM(entry, 1);
    PyObject *defaults = PyTuple_GET_ITEM(entry, 2);
    long sflag = PyLong_AsLong(PyTuple_GET_ITEM(entry, 3));
    if (sflag == -1 && PyErr_Occurred()) return -1;
    PyObject *guards = PyTuple_GET_ITEM(entry, 4);
    if (!PyTuple_Check(guards)) return -2;
    int eidx = reg_elem(c, e);
    if (eidx < 0) return -1;
    if (c->n_shapes >= c->cap_shapes) {
        size_t ncap = c->cap_shapes ? c->cap_shapes * 2 : 32;
        CShape *ns = realloc(c->shape_vals, ncap * sizeof(CShape));
        if (!ns) { PyErr_NoMemory(); return -1; }
        c->shape_vals = ns; c->cap_shapes = ncap;
    }
    CShape *sh = &c->shape_vals[c->n_shapes];
    Py_INCREF(e); Py_INCREF(attrs); Py_INCREF(defaults);
    Py_INCREF(guards);
    sh->e = e; sh->attrs = attrs; sh->defaults = defaults;
    sh->guards = guards;
    sh->guard_gen = 0;
    sh->eidx = eidx;
    sh->n_attrs = (int)PyTuple_GET_SIZE(attrs);
    sh->sflag = (int)sflag;
    int idx = (int)c->n_shapes++;
    if (strmap_put(&c->shapes, key, (Py_ssize_t)klen, idx) < 0) {
        PyErr_NoMemory(); return -1;
    }
    return idx;
}

/* Try the shape path for an unregistered begin tag.
 * Returns 1 matched (*eidx_out/*sflag_out set; in tape mode
 * *entry_out = new ('b', e, atts, False, False) ref; gq_* filled
 * with the value spans of unquoted non-name-token values whose
 * "Attribute value requires quotes" warning the commit site must
 * replay), 0 not applicable, -1 error. */
static int shape_try(CtxObject *c, Sess *S, const Py_UCS1 *decl,
                     Py_ssize_t dlen, int tape_mode, int is_xml,
                     int *eidx_out,
                     int *sflag_out, PyObject **entry_out,
                     Py_ssize_t *gq_start, Py_ssize_t *gq_len,
                     int *gq_n)
{
    char kbuf[SHAPE_KEY_MAX];
    size_t klen = 0;
    Py_ssize_t vstart[MAX_SHAPE_ATTRS], vlen[MAX_SHAPE_ATTRS];
    unsigned int gmask = 0;
    int na = shape_scan(decl, dlen, S->fold, !is_xml, S->shorttag,
                        kbuf, &klen, vstart, vlen, &gmask);
    if (!na) return 0;
    int si = shape_probe(c, kbuf, klen);
    if (si == -1) return -1;
    if (si == -2) return 0;
    CShape *sh = &c->shape_vals[si];
    if (sh->n_attrs != na) return 0;    /* defensive */
    if (PyTuple_GET_SIZE(sh->guards) > 0 &&
        sh->guard_gen != c->sess_counter) {
        /* implicit-attr guards: replay only while every guarded
         * attr exists on the element THIS parse (an earlier tag
         * took the full path, griped cold and created it); attrs
         * never vanish mid-parse, so validate once per session */
        PyObject *find = PyObject_GetAttr(sh->e, c->s_find_attribute);
        if (!find) return -1;
        Py_ssize_t ng = PyTuple_GET_SIZE(sh->guards);
        for (Py_ssize_t k = 0; k < ng; k++) {
            PyObject *r = PyObject_CallFunctionObjArgs(
                find, PyTuple_GET_ITEM(sh->guards, k), NULL);
            if (!r) { Py_DECREF(find); return -1; }
            int absent = (r == Py_None);
            Py_DECREF(r);
            if (absent) { Py_DECREF(find); return 0; }
        }
        Py_DECREF(find);
        sh->guard_gen = c->sess_counter;
    }
    *gq_n = 0;
    if (gmask) {
        for (int k = 0; k < na; k++)
            if (gmask & (1u << k)) {
                gq_start[*gq_n] = vstart[k];
                gq_len[*gq_n] = vlen[k];
                (*gq_n)++;
            }
    }
    *eidx_out = sh->eidx;
    *sflag_out = sh->sflag;
    *entry_out = NULL;
    if (tape_mode) {
        Py_ssize_t nd = PyTuple_GET_SIZE(sh->defaults);
        PyObject *atts = PyList_New(na + nd);
        if (!atts) return -1;
        for (int k = 0; k < na; k++) {
            PyObject *val = PyUnicode_DecodeLatin1(
                (const char *)decl + vstart[k], vlen[k], NULL);
            if (!val) { Py_DECREF(atts); return -1; }
            PyObject *pair = PyTuple_Pack(
                2, PyTuple_GET_ITEM(sh->attrs, k), val);
            Py_DECREF(val);
            if (!pair) { Py_DECREF(atts); return -1; }
            PyList_SET_ITEM(atts, k, pair);       /* steals */
        }
        for (Py_ssize_t k = 0; k < nd; k++) {
            PyObject *pair = PyTuple_GET_ITEM(sh->defaults, k);
            Py_INCREF(pair);
            PyList_SET_ITEM(atts, na + k, pair);
        }
        PyObject *entry = Py_BuildValue("(sOOOO)", "b", sh->e, atts,
                                        Py_False, Py_False);
        Py_DECREF(atts);
        if (!entry) return -1;
        *entry_out = entry;
    }
    return 1;
}

/* Replay "Attribute value requires quotes" warnings for a committed
 * shape tag: exact Gripes.syntax_warning text + str_summary(_, 25)
 * truncation (errors.py:27-45), line = tag startloc line (gripe()
 * reads self.startloc[0]).  WARNING severity never bumps
 * error_count nor raises StopParse; quiet parsers append nothing
 * (gripe()'s severity != STYLE and not quiet branch). */
static int emit_rq_gripes(CtxObject *c, Sess *S, const Py_UCS1 *decl,
                          const Py_ssize_t *gq_start,
                          const Py_ssize_t *gq_len, int gq_n)
{
    static const char PREFIX[] =
        "Attribute value requires quotes, found \"";
    if (S->quiet) return 0;
    PyObject *errors = PyObject_GetAttr(S->parser, c->s_errors);
    if (!errors) return -1;
    if (!PyList_Check(errors)) { Py_DECREF(errors); return 0; }
    for (int k = 0; k < gq_n; k++) {
        char buf[96];
        const char *v = (const char *)decl + gq_start[k];
        Py_ssize_t vl = gq_len[k];
        size_t bn = sizeof(PREFIX) - 1;
        memcpy(buf, PREFIX, bn);
        /* str_summary: verbatim if <= 25 chars, else first 17 +
         * "..." + last 5; unquoted values contain no CR/LF (blanks
         * terminate the scan), so no newline mapping is needed */
        if (vl <= 25) {
            memcpy(buf + bn, v, (size_t)vl); bn += (size_t)vl;
        } else {
            memcpy(buf + bn, v, 17); bn += 17;
            memcpy(buf + bn, "...", 3); bn += 3;
            memcpy(buf + bn, v + vl - 5, 5); bn += 5;
        }
        buf[bn++] = '"';
        PyObject *msg = PyUnicode_DecodeLatin1(buf, (Py_ssize_t)bn,
                                               NULL);
        if (!msg) { Py_DECREF(errors); return -1; }
        PyObject *line = PyLong_FromLong(S->ev_sl_l);
        if (!line) { Py_DECREF(msg); Py_DECREF(errors); return -1; }
        PyObject *pe = PyObject_CallFunctionObjArgs(
            c->parse_error, c->sev_warning, line, msg, NULL);
        Py_DECREF(line); Py_DECREF(msg);
        if (!pe) { Py_DECREF(errors); return -1; }
        int ar = PyList_Append(errors, pe);
        Py_DECREF(pe);
        if (ar < 0) { Py_DECREF(errors); return -1; }
    }
    Py_DECREF(errors);
    return 0;
}

/* ---------------------------------------------------------------- */
/* the executor                                                      */
/* ---------------------------------------------------------------- */

/* pcdata_fast(ctx, parser, text, i, n, utf8, is_xml[, tape]) ->
 * long new_i, or -1 ("not applicable, run the Python executor").
 * tape != 0: record begin/end/data events into parser._c_tape for
 * the Python drain instead of requiring no-op sinks (DOM builders,
 * counters, ESIS — any parser whose sinks don't feed back into
 * tokenization). */
static PyObject *pcdata_fast(PyObject *self, PyObject *args)
{
    (void)self;
    CtxObject *c;
    PyObject *parser, *text;
    Py_ssize_t i, n;
    int utf8, is_xml, tape_mode = 0;
    if (!PyArg_ParseTuple(args, "O!OOnnpp|p", &Ctx_Type, &c, &parser,
                          &text, &i, &n, &utf8, &is_xml, &tape_mode))
        return NULL;
    if (PyUnicode_READY(text) < 0) return NULL;
    if (PyUnicode_KIND(text) != PyUnicode_1BYTE_KIND)
        return PyLong_FromLong(-1);
    const Py_UCS1 *T = PyUnicode_1BYTE_DATA(text);

    Sess S;
    int br = sess_build(&S, c, parser, tape_mode);
    if (br != 0) {
        sess_free(&S);
        if (br < 0) return NULL;
        return PyLong_FromLong(-1);
    }

#define BAIL_OUT() do { goto finish; } while (0)
#define FAIL() do { rc = -1; goto finish; } while (0)

    int rc = 0;
    int switch_state = -1, switch_etag = -1;
    PyObject *out_map = NULL;
    int out_map_dirty = 0;
    PyObject *shape_entry = NULL;   /* per-occurrence ('b', e, atts,
                                     * False, False) for the tape;
                                     * freed after the event commits
                                     * or at finish on any bail */
    Py_ssize_t start_i = i;
    (void)start_i;

    while (i < n) {
        Py_UCS1 ch = T[i];
        if (ch == '<') {
            /* ---- whole-tag match (mirrors _RE_FULLTAG) ---- */
            Py_ssize_t j = i + 1;
            if (j >= n) break;
            Py_UCS1 c1 = T[j];
            Py_ssize_t tag_end = -1;    /* index of '>' */
            int ascii_ok = 1;
            if (c1 == '/') {
                j++;
                if (j >= n) break;
                Py_UCS1 c2 = T[j];
                if (!((c2 >= 'A' && c2 <= 'Z') || (c2 >= 'a' && c2 <= 'z')))
                    break;
                j++;
                while (j < n) {
                    Py_UCS1 x = T[j];
                    if (x == '>') { tag_end = j; break; }
                    if (x == '"' || x == '\'' || x == '<') break;
                    if (x >= 0x80) ascii_ok = 0;
                    j++;
                }
            } else if ((c1 >= 'A' && c1 <= 'Z') || (c1 >= 'a' && c1 <= 'z')) {
                j++;
                while (j < n) {
                    Py_UCS1 x = T[j];
                    if (x == '>') { tag_end = j; break; }
                    if (x == '<') break;
                    if (x == '"' || x == '\'') {
                        Py_UCS1 q = x;
                        j++;
                        while (j < n && T[j] != q && T[j] != '<') {
                            if (T[j] >= 0x80) ascii_ok = 0;
                            j++;
                        }
                        if (j >= n || T[j] != q) { tag_end = -1; break; }
                        j++;
                        continue;
                    }
                    if (x >= 0x80) ascii_ok = 0;
                    j++;
                }
            }
            if (tag_end < 0) break;             /* FSM handles '<' */
            if (utf8 && !ascii_ok) break;
            const char *decl = (const char *)T + i + 1;
            Py_ssize_t dlen = tag_end - i - 1;
            int64_t entry = 0;
            int hit = tag_probe(c, decl, dlen, &entry);
            if (hit < 0) FAIL();
            int kind, eidx;
            int sh_sflag = -1;
            Py_ssize_t gq_start[MAX_SHAPE_ATTRS],
                       gq_len[MAX_SHAPE_ATTRS];
            int gq_n = 0;
            Py_XDECREF(shape_entry); shape_entry = NULL;
            if (hit) {
                kind = TAG_KIND(entry);
                eidx = TAG_EIDX(entry);
            } else {
                if (c1 == '/')
                    break;      /* end tags: string memo only */
                int sr = shape_try(c, &S, T + i + 1, dlen, tape_mode,
                                   is_xml, &eidx, &sh_sflag,
                                   &shape_entry,
                                   gq_start, gq_len, &gq_n);
                if (sr < 0) FAIL();
                if (sr == 0) break;             /* miss: general loop */
                kind = 1;
            }
            CElem *ce = &c->elems[eidx];

            /* prepare_cdata complications — parser.py:873-889 runs
             * this BEFORE the kind dispatch, so it guards END tags
             * too (e.g. <img> <!----></img>: the end tag's prepare
             * pops the C_EMPTY top first) -> bail pre-token */
            if (S.cdata.n) {
                if (S.depth) {
                    CElem *tp = &c->elems[S.env[S.depth - 1].eidx];
                    if (tp->has_struct && !tp->undefined &&
                        tp->stype == c->C_EMPTY)
                        break;                   /* need_full */
                }
                if (S.blank_cdata) {
                    int allb = 1;
                    for (size_t k2 = 0; k2 < S.cdata.n; k2++)
                        if (!is_blank4(S.cdata.d[k2])) { allb = 0; break; }
                    if (!allb) break;            /* need_full */
                }
            }

            /* location over the tag (set startloc AFTER we know we
             * will consume — all bail paths below are pre-commit) */
            Py_ssize_t tl = tag_end + 1 - i;
            long nl = 0; Py_ssize_t lastlf = -1;
            for (Py_ssize_t k2 = i; k2 <= tag_end; k2++)
                if (T[k2] == '\n') { nl++; lastlf = k2; }
            /* tape events for this tag see startloc = tag start and
             * charpos = past the '>', exactly what Python's executor
             * writes back before the replay (parser.py:925-937) */
            S.ev_sl_l = S.line; S.ev_sl_p = S.linepos + 1;
            S.ev_sl_c = S.charpos;
            S.ev_cp = S.charpos + (long)tl;

            if (kind == 1) {
                /* ---------- begin tag ---------- */
                int is_empty = hit ? TAG_EMPTY(entry) : 0;
                if (is_empty) {
                    /* EMPTY begin commits as begin+immediate close
                     * (parser._replay_tag: push, _emit_begin,
                     * close_element) — net zero env change, so the
                     * commit below skips the push and emits both
                     * tape events.  Kept in Python: conref (resets
                     * cdata_state) and CDATA/RCDATA-typed elements
                     * (<style/> state switch semantics). */
                    if (TAG_CONREF(entry)) break;
                    if (!ce->undefined && ce->has_struct &&
                        (ce->stype == c->C_CDATA ||
                         ce->stype == c->C_RCDATA)) break;
                    /* close_element validates completeness at the
                     * element's INITIAL state (no content consumed);
                     * a would-gripe (<x/> with an unsatisfied model)
                     * bails to Python pre-commit */
                    CEnv etmp; etmp.eidx = eidx; etmp.sidx = -1;
                    if (!ce->undefined && ce->has_struct &&
                        ce->stype != c->C_ANY) {
                        if (elem_resolve_engine(c, eidx) < 0) FAIL();
                        etmp.sidx = ce->initial;
                    }
                    int okc = check_complete(&S, &etmp);
                    if (okc < 0) FAIL();
                    if (!okc) break;             /* would gripe: bail */
                }
                /* <br>-shape top: implied-close it when the incoming
                 * element transitions DIRECTLY one level up (the one
                 * pop Python's omit-close walk would take; no pending
                 * cdata possible — the prepare guard bailed that).
                 * fits is checked BEFORE the close commits: a
                 * non-fitting element must reach Python with the
                 * C_EMPTY top still open (the gripe-and-push-under
                 * path nests under it). */
                {
                    int et = empty_top_closable(c, &S);
                    if (et < 0) FAIL();
                    if (et) {
                        CEnv *up = &S.env[S.depth - 2];
                        CElem *ue = &c->elems[up->eidx];
                        int fits = 0;
                        if (!ue->undefined && ue->has_struct &&
                            ue->stype != c->C_ANY && up->sidx >= 0) {
                            int t2 = trans_get(c, up->sidx, eidx);
                            if (t2 == -9) FAIL();
                            fits = t2 >= 0;
                        }
                        if (!fits) break;
                        if (implied_close_empty_top(c, &S) < 0)
                            FAIL();
                    }
                }
                if (!S.depth) break;             /* open_element: bail */
                if (S.depth + 1 >= MAX_DEPTH) break;   /* deep: bail */
                int sflag = hit ? TAG_SPACE(entry) : sh_sflag;
                if (is_xml && sflag == -2)
                    break;      /* invalid xml:space -> gripe: bail */
                CEnv *env = &S.env[S.depth - 1];
                CElem *pe = &c->elems[env->eidx];
                if (!pe->has_struct || pe->stype == c->C_ANY)
                    break;                       /* open_element: bail */
                CEnv *penv = env;
                int popped = 0;
                if (pe->undefined) {
                    /* open_element's allow_for branch: a pure push
                     * (no transition walk, no gripes, state kept)
                     * once the child is known-allowed; the first
                     * (parent, child) occurrence bails to Python */
                    int am = allow_member(c, env->eidx, eidx);
                    if (am == -9) FAIL();
                    if (!am) break;
                    /* push_element flushes with the CURRENT state
                     * (parser.py:2815-2816) */
                    int er = emit_flush(&S, env, 0, 0, NULL);
                    if (er < 0) FAIL();
                    if (er == 1) break;          /* would gripe: bail */
                    er = emit_flush(&S, env, 0, 1, NULL);
                    if (er != 0) FAIL();
                    goto undef_push;
                }
                /* inclusion/exclusion: bail if the DTD has any (the
                 * env-stack walk + its gripes stay in Python) */
                if (env->sidx < 0) break;
                int new_s = trans_get(c, env->sidx, eidx);
                if (new_s == -9) FAIL();
                if (new_s < 0) {
                    /* one-level omitted-close walk */
                    if (S.depth < 2 || !pe->omit_close) break;
                    int op = omit_get(c, env->sidx, eidx);
                    if (op == -9) FAIL();
                    if (op) break;               /* path exists: bail */
                    CEnv *env1 = &S.env[S.depth - 2];
                    if (env1->sidx < 0) break;
                    int new1 = trans_get(c, env1->sidx, eidx);
                    if (new1 == -9) FAIL();
                    if (new1 < 0) break;
                    /* validate the element being closed (pre-flush
                     * state: parser.py:936-958 runs validation
                     * BEFORE the flush on this path) */
                    int okc = check_complete(&S, env);
                    if (okc < 0) FAIL();
                    if (!okc) break;             /* would gripe: bail */
                    /* flush cdata (last=True) — dry-run first */
                    int er = emit_flush(&S, env, 1, 0, NULL);
                    if (er < 0) FAIL();
                    if (er == 1) break;          /* would gripe: bail */
                    if (env1->map) break;        /* map restore: bail */
                    /* ---- commit the one-level close ---- */
                    er = emit_flush(&S, env, 1, 1, NULL);
                    if (er != 0) FAIL();
                    /* Python order: flush, first=False, ev_end, pop
                     * (parser.py:1080-1090) */
                    if (tape_end(&S, pe->name) < 0) FAIL();
                    env1->sidx = new1;
                    env1->dirty = env1->py_env != NULL;
                    S.first = 0;
                    S.depth--;
                    if (S.depth < S.survive) S.survive = S.depth;
                    penv = env1;
                    new_s = new1;
                    popped = 1;
                    (void)popped;
                } else {
                    /* parser.py:1027-1056 order: env.state = new
                     * FIRST, then the flush (whose blank-#PCDATA
                     * transition starts from the NEW state) */
                    int save = penv->sidx;
                    penv->sidx = new_s;
                    int er = emit_flush(&S, penv, 0, 0, NULL);
                    if (er < 0) { penv->sidx = save; FAIL(); }
                    if (er == 1) { penv->sidx = save; break; }
                    er = emit_flush(&S, penv, 0, 1, NULL);
                    if (er != 0) { penv->sidx = save; FAIL(); }
                    penv->dirty = penv->py_env != NULL;
                }
                /* push the new element (depth-capped pre-token) */
undef_push:
                /* per-occurrence warning replay for unquoted
                 * non-name-token values — at commit only, so a bail
                 * never double-gripes (the full path would re-gripe) */
                if (gq_n &&
                    emit_rq_gripes(c, &S, T + i + 1, gq_start,
                                   gq_len, gq_n) < 0) FAIL();
                /* startloc + location advance (committed now) */
                S.startloc_l = S.line; S.startloc_p = S.linepos + 1;
                S.startloc_c = S.charpos; S.startloc_dirty = 1;
                S.charpos += tl;
                if (nl) { S.line += nl; S.linepos = tag_end - lastlf; }
                else S.linepos += tl;

                if (is_empty) {
                    /* begin + immediate close, no push: map/space
                     * mode installs are net-zero (pushed then popped
                     * with nothing parsed in between), completeness
                     * was validated pre-commit above.  Python event
                     * order: _emit_begin then close_element's
                     * ev_end (parser._replay_tag). */
                    int ti = TAG_TIDX(entry);
                    if (ti && tape_begin(&S, c->tag_objs[ti - 1]) < 0)
                        FAIL();
                    if (tape_end(&S, ce->name) < 0) FAIL();
                    S.first = 0;
                    i = tag_end + 1;
                    continue;
                }

                CEnv *nenv = &S.env[S.depth++];
                nenv->eidx = eidx;
                nenv->py_env = NULL;
                nenv->dirty = 0;
                nenv->cm_in = nenv->cm_out = -1;
                nenv->space_mode = penv->space_mode;
                if (ce->undefined) {
                    /* engine must be read live (allow_for mutates) */
                    PyObject *init = PyObject_CallFunctionObjArgs(
                        c->make_state_engine, ce->obj, NULL);
                    if (!init) FAIL();
                    if (init == Py_None) nenv->sidx = -1;
                    else {
                        nenv->sidx = reg_state(c, init);
                        if (nenv->sidx < 0) { Py_DECREF(init); FAIL(); }
                    }
                    Py_DECREF(init);
                } else {
                    if (elem_resolve_engine(c, eidx) < 0) FAIL();
                    nenv->sidx = ce->initial;
                }
                PyObject *nmap = NULL;
                if (ce->has_map) {
                    PyObject *m = PyObject_GetAttr(ce->obj, c->s_map);
                    if (!m) FAIL();
                    Py_DECREF(m);       /* borrowed via elem */
                    nmap = (m == Py_None) ? NULL : m;
                } else {
                    nmap = penv->map;
                }
                nenv->map = nmap;
                S.first = 1;
                /* update_space_mode (XML dialects only; parser.py
                 * 1112-1116): outcome precomputed per memo entry */
                if (is_xml && sflag >= 0)
                    nenv->space_mode = sflag;
                /* Python replay order: open_element, update_space_
                 * mode, then _emit_begin (parser.py:2388-2392) */
                if (shape_entry) {
                    if (tape_begin(&S, shape_entry) < 0) FAIL();
                    Py_DECREF(shape_entry);
                    shape_entry = NULL;
                } else {
                    int ti = TAG_TIDX(entry);
                    if (ti &&
                        tape_begin(&S, c->tag_objs[ti - 1]) < 0)
                        FAIL();
                }
                i = tag_end + 1;
                if (ce->undefined) {
                    /* live structure read for the CDATA/RCDATA check */
                    PyObject *stc = PyObject_GetAttr(ce->obj,
                                                     c->s_structure);
                    if (!stc) FAIL();
                    int t = -1;
                    if (stc != Py_None) {
                        PyObject *tt = PyObject_GetAttr(stc, c->s_type);
                        if (!tt) { Py_DECREF(stc); FAIL(); }
                        t = (int)PyLong_AsLong(tt);
                        Py_DECREF(tt);
                    }
                    Py_DECREF(stc);
                    if (t == c->C_CDATA || t == c->C_RCDATA) {
                        switch_state = (t == c->C_CDATA)
                            ? c->S_CDATA : c->S_RCDATA;
                        switch_etag = eidx;
                        S.startcd_l = S.line; S.startcd_p = S.linepos;
                        S.startcd_c = S.charpos; S.startcd_dirty = 1;
                        goto finish;
                    }
                } else if (ce->has_struct &&
                           (ce->stype == c->C_CDATA ||
                            ce->stype == c->C_RCDATA)) {
                    switch_state = (ce->stype == c->C_CDATA)
                        ? c->S_CDATA : c->S_RCDATA;
                    switch_etag = eidx;
                    S.startcd_l = S.line; S.startcd_p = S.linepos;
                    S.startcd_c = S.charpos; S.startcd_dirty = 1;
                    goto finish;
                }
                if (nmap) {             /* shortref map installed */
                    out_map = nmap; out_map_dirty = 1;
                    goto finish;
                }
                continue;
            }

            /* ---------- end tag ---------- */
            /* <br>-shape top: close_element's unwind pops it first
             * (silently — omit_close + complete) when the end tag
             * names the element one level up */
            {
                int et = empty_top_closable(c, &S);
                if (et < 0) FAIL();
                if (et && S.depth >= 2 &&
                    S.env[S.depth - 2].eidx == eidx) {
                    if (implied_close_empty_top(c, &S) < 0) FAIL();
                }
            }
            if (!S.depth || S.env[S.depth - 1].eidx != eidx)
                break;                  /* close_element walk: bail */
            {
                CEnv *env = &S.env[S.depth - 1];
                /* parser.py:1135-1207 order: flush FIRST, then
                 * validate against the POST-flush state */
                int post = env->sidx;
                int er = emit_flush(&S, env, 1, 0, &post);
                if (er < 0) FAIL();
                if (er == 1) break;     /* would gripe: bail */
                int save = env->sidx;
                env->sidx = post;
                int okc = check_complete(&S, env);
                env->sidx = save;
                if (okc < 0) FAIL();
                if (!okc) break;        /* would gripe: bail */
                PyObject *pm = (S.depth >= 2)
                    ? S.env[S.depth - 2].map : NULL;
                er = emit_flush(&S, env, 1, 1, NULL);
                if (er != 0) FAIL();
                /* Python order: flush, ev_end(e.name), pop
                 * (parser.py:1270-1280) */
                if (tape_end(&S, c->elems[eidx].name) < 0) FAIL();
                S.first = 0;
                S.depth--;
                if (S.depth < S.survive) S.survive = S.depth;
                S.startloc_l = S.line; S.startloc_p = S.linepos + 1;
                S.startloc_c = S.charpos; S.startloc_dirty = 1;
                S.charpos += tl;
                if (nl) { S.line += nl; S.linepos = tag_end - lastlf; }
                else S.linepos += tl;
                i = tag_end + 1;
                if (pm) {
                    out_map = pm; out_map_dirty = 1;
                    goto finish;
                }
                continue;
            }
        }
        if (ch == '&') {
            /* ---- whole-entity match (mirrors _RE_FULLENT) ---- */
            Py_ssize_t j = i + 1;
            if (j < n && T[j] == '#') j++;
            Py_ssize_t name_start = (T[i + 1] == '#') ? i + 1 : i + 1;
            Py_ssize_t k2 = j;
            while (k2 < n) {
                Py_UCS1 x = T[k2];
                if ((x >= 'A' && x <= 'Z') || (x >= 'a' && x <= 'z') ||
                    (x >= '0' && x <= '9') || x == '.' || x == '_' ||
                    x == ':' || x == '-')
                    k2++;
                else break;
            }
            if (k2 == j || k2 >= n || T[k2] != ';') break;
            Py_ssize_t nlen = k2 - name_start;
            int ei = ent_probe(c, (const char *)T + name_start, nlen);
            if (ei == -1 && PyErr_Occurred()) FAIL();
            if (ei < 0) break;          /* miss: process_entity full */
            CEntity *fe = &c->ent_vals[ei];
            Py_ssize_t ml = k2 + 1 - i;
            if (fe->kind == 0) {
                /* numeric: plain append, no blank handling */
                S.startloc_l = S.line; S.startloc_p = S.linepos + 1;
                S.startloc_c = S.charpos; S.startloc_dirty = 1;
                S.charpos += ml; S.linepos += ml;
                if (!S.cdata.n) {
                    /* NOTE: executor does NOT set startcdata for
                     * entity appends (mirrors parser.py:1248-1296
                     * where no startcdata write occurs) */
                }
                if (buf_push(&S.cdata, PyUnicode_ReadChar(fe->s, 0)) < 0)
                    FAIL();
                i += ml;
                continue;
            }
            Py_ssize_t slen = PyUnicode_GET_LENGTH(fe->s);
            if (slen == 0) {
                S.startloc_l = S.line; S.startloc_p = S.linepos + 1;
                S.startloc_c = S.charpos; S.startloc_dirty = 1;
                S.charpos += ml; S.linepos += ml;
                i += ml;
                continue;
            }
            if (S.blank_cdata && (fe->kind == 2 || !fe->is_blank)) {
                CEnv *env = S.depth ? &S.env[S.depth - 1] : NULL;
                int handled = 0;
                /* <br>-shape top: same up-open-then-implied-close as
                 * the span open (entity directly after <br>) */
                int et = empty_top_closable(c, &S);
                if (et < 0) FAIL();
                if (et) {
                    int r2 = pcdata_open(c, &S, &S.env[S.depth - 2],
                                         0);
                    if (r2 < 0) FAIL();
                    if (r2) {
                        if (implied_close_empty_top(c, &S) < 0)
                            FAIL();
                        handled = 1;
                    }
                }
                if (!handled && env &&
                    env->cm_in >= 0 && env->cm_in == env->sidx) {
                    env->sidx = env->cm_out;
                    env->dirty = env->py_env != NULL;
                    S.cmbe = 0;
                    handled = 1;
                } else if (!handled && env &&
                           c->elems[env->eidx].undefined &&
                           c->elems[env->eidx].has_struct) {
                    /* undefined parent: #PCDATA open is a no-op once
                     * allowed (open_element's allow_for branch) */
                    int am = allow_member(c, env->eidx, CDATA_EIDX);
                    if (am == -9) FAIL();
                    if (am) { S.cmbe = 0; handled = 1; }
                }
                if (!handled) break;    /* open_element: bail */
                S.blank_cdata = 0;
            }
            S.startloc_l = S.line; S.startloc_p = S.linepos + 1;
            S.startloc_c = S.charpos; S.startloc_dirty = 1;
            S.charpos += ml; S.linepos += ml;
            if (fe->kind == 1) {
                if (buf_push(&S.cdata, PyUnicode_ReadChar(fe->s, 0)) < 0)
                    FAIL();
            } else {
                for (Py_ssize_t q = 0; q < slen; q++)
                    if (buf_push(&S.cdata,
                                 PyUnicode_ReadChar(fe->s, q)) < 0)
                        FAIL();
            }
            i += ml;
            continue;
        }
        if (ch == '\r') {
            /* putchar CR inline (parser.py:1576+ S_PCDATA +
             * add_cdata: CR is blank, no LF dance for CR itself,
             * map is None).  startcdata uses the pre-char rule like
             * every span site (r5: putchar itself was aligned). */
            if (!S.cdata.n) {
                S.startcd_l = S.line; S.startcd_p = S.linepos + 1;
                S.startcd_c = S.charpos; S.startcd_dirty = 1;
            }
            S.charpos += 1;
            S.linepos = 0;
            if (buf_push(&S.cdata, '\r') < 0) FAIL();
            i++;
            continue;
        }
        /* ---- PCDATA span: up to '<' '&' '\r' (or >=0x80 if utf8) -- */
        {
            Py_ssize_t j = i;
            if (utf8) {
                while (j < n) {
                    Py_UCS1 x = T[j];
                    if (x == '<' || x == '&' || x == '\r' || x >= 0x80)
                        break;
                    j++;
                }
            } else {
                while (j < n) {
                    Py_UCS1 x = T[j];
                    if (x == '<' || x == '&' || x == '\r') break;
                    j++;
                }
            }
            if (j == i) break;          /* multibyte lead: FSM */
            Py_ssize_t ns = j - i;
            Py_ssize_t k = 0;
            if (S.blank_cdata) {
                /* leading blanks (span has no CR): ' ' '\t' '\n' */
                while (k < ns) {
                    Py_UCS1 x = T[i + k];
                    if (x == ' ' || x == '\t' || x == '\n') k++;
                    else break;
                }
                if (k < ns) {
                    /* non-blank present: need the #PCDATA open */
                    int handled = 0;
                    /* <br>-shape top: text opens ONE level up after
                     * the implied close (open_element's walk;
                     * pop_to with e0=#PCDATA flushes nothing).  The
                     * up-open is tried FIRST — it mutates only on
                     * success, so a miss leaves the C_EMPTY top
                     * open for Python's walk. */
                    int et = empty_top_closable(c, &S);
                    if (et < 0) FAIL();
                    if (et) {
                        int r2 = pcdata_open(c, &S,
                                             &S.env[S.depth - 2], 0);
                        if (r2 < 0) FAIL();
                        if (r2) {
                            if (implied_close_empty_top(c, &S) < 0)
                                FAIL();
                            handled = 1;
                        }
                    }
                    if (!handled && S.depth) {
                        int r2 = pcdata_open(c, &S,
                                             &S.env[S.depth - 1], 1);
                        if (r2 < 0) FAIL();
                        handled = r2;
                    }
                    if (!handled) break;    /* open_element: bail */
                    S.blank_cdata = 0;
                }
                /* append blank prefix */
                if (k) {
                    if (!S.cdata.n) {
                        S.startcd_l = S.line;
                        S.startcd_p = S.linepos + 1;
                        S.startcd_c = S.charpos;
                        S.startcd_dirty = 1;
                    } else if (T[i] == '\n' &&
                               S.cdata.d[S.cdata.n - 1] == '\r' &&
                               S.depth &&
                               S.env[S.depth - 1].space_mode !=
                                   c->SP_STRICT) {
                        S.cdata.n--;
                    }
                    if (buf_push_span(&S.cdata, T + i, (size_t)k) < 0)
                        FAIL();
                }
                if (k < ns) {
                    const Py_UCS1 *rest = T + i + k;
                    if (!S.cdata.n) {
                        /* location of the rest's first char */
                        long rl = S.line, rp = S.linepos, rcp = S.charpos;
                        for (Py_ssize_t q = 0; q < k; q++) {
                            rcp++;
                            if (T[i + q] == '\n') { rl++; rp = 0; }
                            else rp++;
                        }
                        S.startcd_l = rl; S.startcd_p = rp + 1;
                        S.startcd_c = rcp; S.startcd_dirty = 1;
                    } else if (rest[0] == '\n' &&
                               S.cdata.d[S.cdata.n - 1] == '\r' &&
                               S.depth &&
                               S.env[S.depth - 1].space_mode !=
                                   c->SP_STRICT) {
                        S.cdata.n--;
                    }
                    if (buf_push_span(&S.cdata, rest,
                                      (size_t)(ns - k)) < 0)
                        FAIL();
                }
            } else {
                if (!S.cdata.n) {
                    S.startcd_l = S.line; S.startcd_p = S.linepos + 1;
                    S.startcd_c = S.charpos; S.startcd_dirty = 1;
                } else if (T[i] == '\n' &&
                           S.cdata.d[S.cdata.n - 1] == '\r' &&
                           S.depth &&
                           S.env[S.depth - 1].space_mode !=
                               c->SP_STRICT) {
                    S.cdata.n--;
                }
                if (buf_push_span(&S.cdata, T + i, (size_t)ns) < 0)
                    FAIL();
            }
            /* location over the span */
            long nl2 = 0; Py_ssize_t lastlf2 = -1;
            for (Py_ssize_t q = i; q < j; q++)
                if (T[q] == '\n') { nl2++; lastlf2 = q; }
            S.charpos += ns;
            if (nl2) { S.line += nl2; S.linepos = j - lastlf2 - 1; }
            else S.linepos += ns;
            i = j;
            continue;
        }
    }

finish:
    Py_XDECREF(shape_entry);    /* bailed after a shape match */
    if (rc == 0) {
        if (sess_writeback(&S, switch_state, switch_etag, out_map,
                           out_map_dirty) < 0)
            rc = -1;
    }
    sess_free(&S);
    if (rc < 0) return NULL;
    return PyLong_FromSsize_t(i);
}

/* ---------------------------------------------------------------- */
/* make_ctx(dtd, consts_dict, callbacks_dict) -> Ctx                 */
/* ---------------------------------------------------------------- */

static int grab_const(PyObject *d, const char *name, int *out)
{
    PyObject *v = PyDict_GetItemString(d, name);
    if (!v) {
        PyErr_Format(PyExc_KeyError, "cspeed const %s", name);
        return -1;
    }
    *out = (int)PyLong_AsLong(v);
    return PyErr_Occurred() ? -1 : 0;
}

static PyObject *grab_cb(PyObject *d, const char *name)
{
    PyObject *v = PyDict_GetItemString(d, name);
    if (!v) {
        PyErr_Format(PyExc_KeyError, "cspeed callback %s", name);
        return NULL;
    }
    Py_INCREF(v);
    return v;
}

static PyObject *make_ctx(PyObject *self, PyObject *args)
{
    (void)self;
    PyObject *dtd, *consts, *cbs;
    if (!PyArg_ParseTuple(args, "OOO", &dtd, &consts, &cbs))
        return NULL;
    CtxObject *c = PyObject_New(CtxObject, &Ctx_Type);
    if (!c) return NULL;
    memset(((char *)c) + sizeof(PyObject), 0,
           sizeof(CtxObject) - sizeof(PyObject));
    Py_INCREF(dtd);
    c->dtd = dtd;
    c->gen = -1;            /* forces flush+reseed on first session */
    if (grab_const(consts, "S_PCDATA", &c->S_PCDATA) < 0 ||
        grab_const(consts, "S_CDATA", &c->S_CDATA) < 0 ||
        grab_const(consts, "S_RCDATA", &c->S_RCDATA) < 0 ||
        grab_const(consts, "SP_STRICT", &c->SP_STRICT) < 0 ||
        grab_const(consts, "SP_SGML", &c->SP_SGML) < 0 ||
        grab_const(consts, "SP_DEFAULT", &c->SP_DEFAULT) < 0 ||
        grab_const(consts, "SP_REMOVE", &c->SP_REMOVE) < 0 ||
        grab_const(consts, "SP_PRESERVE", &c->SP_PRESERVE) < 0 ||
        grab_const(consts, "C_EMPTY", &c->C_EMPTY) < 0 ||
        grab_const(consts, "C_CDATA", &c->C_CDATA) < 0 ||
        grab_const(consts, "C_RCDATA", &c->C_RCDATA) < 0 ||
        grab_const(consts, "C_ANY", &c->C_ANY) < 0 ||
        grab_const(consts, "MT_PCDATA", &c->MT_PCDATA) < 0 ||
        grab_const(consts, "MT_ELEMENT", &c->MT_ELEMENT) < 0)
        goto fail;
    if (!(c->make_dtd_transition = grab_cb(cbs, "make_dtd_transition")) ||
        !(c->same_state = grab_cb(cbs, "same_state")) ||
        !(c->find_omitted_path = grab_cb(cbs, "find_omitted_path")) ||
        !(c->make_state_engine = grab_cb(cbs, "make_state_engine")) ||
        !(c->omit_gen_list = grab_cb(cbs, "omit_gen")) ||
        !(c->allow_gen_list = grab_cb(cbs, "allow_gen")) ||
        !(c->env_class = grab_cb(cbs, "environment")) ||
        !(c->cdata_element = grab_cb(cbs, "cdata_element")) ||
        !(c->space_flag = grab_cb(cbs, "space_flag")) ||
        !(c->parse_error = grab_cb(cbs, "parse_error")) ||
        !(c->sev_warning = grab_cb(cbs, "sev_warning")))
        goto fail;
#define INTERN(field, s) \
    if (!(c->field = PyUnicode_InternFromString(s))) goto fail
    INTERN(s_environments, "environments");
    INTERN(s_cdata, "cdata");
    INTERN(s_line, "line");
    INTERN(s_linepos, "linepos");
    INTERN(s_charpos, "charpos");
    INTERN(s_blank_cdata, "blank_cdata");
    INTERN(s_cdata_must_be_empty, "cdata_must_be_empty");
    INTERN(s_first, "first");
    INTERN(s_startloc, "startloc");
    INTERN(s_startcdata, "startcdata");
    INTERN(s_state, "state");
    INTERN(s_cdata_state, "cdata_state");
    INTERN(s_etag, "etag");
    INTERN(s_map, "map");
    INTERN(s_text_parts, "text_parts");
    INTERN(s_element, "element");
    INTERN(s_space_mode, "space_mode");
    INTERN(s_cdata_memo, "cdata_memo");
    INTERN(s_structure, "structure");
    INTERN(s_undefined, "undefined");
    INTERN(s_type, "type");
    INTERN(s_omit_close, "omit_close");
    INTERN(s_initial_state, "initial_state");
    INTERN(s_final_state, "final_state");
    INTERN(s_name, "name");
    INTERN(s__tag_memo, "_tag_memo");
    INTERN(s__ent_fast, "_ent_fast");
    INTERN(s_content, "content");
    INTERN(s_group, "group");
    INTERN(s__shape_memo, "_shape_memo");
    INTERN(s_case_sensitive, "case_sensitive");
    INTERN(s_find_attribute, "find_attribute");
    INTERN(s_errors, "errors");
    INTERN(s_quiet, "quiet");
    INTERN(s_shorttag, "shorttag");
    INTERN(s__c_tape, "_c_tape");
#undef INTERN
    return (PyObject *)c;
fail:
    Py_DECREF(c);
    return NULL;
}

static PyObject *ctx_stats(PyObject *self, PyObject *args)
{
    (void)self;
    CtxObject *c;
    if (!PyArg_ParseTuple(args, "O!", &Ctx_Type, &c)) return NULL;
    return Py_BuildValue("{s:n,s:n,s:n,s:n,s:n}",
                         "n_elems", (Py_ssize_t)c->n_elems,
                         "n_states", (Py_ssize_t)c->n_states,
                         "n_tag_objs", (Py_ssize_t)c->n_tag_objs,
                         "n_ents", (Py_ssize_t)c->n_ents,
                         "n_shapes", (Py_ssize_t)c->n_shapes);
}

/* ==================================================================
 * markdown fold drain (r8)
 *
 * md_drain(tape, frames, mds, skip, convert, def_fold, def_keep
 *          [, skip_box[, att_fold, att_keep]]) -> new skip
 *
 * C replica of core/markdown.py MarkdownParser._drain_tape plus the
 * _fold/_merge_inline/_collapse/_blocks/_indent/_attr helpers it
 * drives.  Frames, chunks and the per-DTD def->fold-name memo stay
 * ORDINARY PYTHON OBJECTS with the exact shapes the Python renderer
 * uses ([fname, attrs, chunks, in_pre] frames; str or ("b"/"li"/
 * "cell", text) chunks; {id(def): fname} memo + keep list), so a
 * parse may freely interleave Python ev_begin/ev_data/ev_end events
 * (ineligible tags bail off the tape) with C drains over the SAME
 * frame stack.  Byte-parity with the Python fold is pinned by the
 * test_markdown.py differentials (goldens + soup fuzz + dialects +
 * deep DOM) — any new fold rule must land in BOTH renderers.
 * ================================================================== */

enum {
    MDC_TRANSPARENT = 0,
    MDC_H1 = 1, MDC_H2, MDC_H3, MDC_H4, MDC_H5, MDC_H6,
    MDC_P, MDC_WRAP2, MDC_WRAP1, MDC_A, MDC_IMG, MDC_BR, MDC_HR,
    MDC_CODE, MDC_PRE, MDC_BLOCKQUOTE, MDC_LI, MDC_UL, MDC_OL,
    MDC_TD, MDC_TH, MDC_TR,
    MDC_DIV,     /* _PRE_LINE member but NOT special */
    MDC_SKIP,    /* script/style/template/noscript/head */
};

#define MD_SPECIAL(c)  ((c) >= MDC_H1 && (c) <= MDC_TR)
#define MD_PRE_LINE(c) (((c) >= MDC_H1 && (c) <= MDC_P) || \
                        (c) == MDC_LI || (c) == MDC_TR || \
                        (c) == MDC_BLOCKQUOTE || (c) == MDC_DIV)

static int md_ready = 0;
static PyObject *md_codes;          /* fold-name str -> PyLong code */
static PyObject *md_space, *md_empty, *md_nl, *md_nl2, *md_br;
static PyObject *md_tag_b, *md_tag_li, *md_tag_cell;
static PyObject *md_ev_d, *md_ev_b;
static PyObject *md_href, *md_alt, *md_src, *md_name_attr;
static PyObject *md_s_type, *md_s_islist;
static PyObject *md_hpfx[7];        /* "# ".."###### " */
static PyObject *md_hr_tuple;       /* ("b", "---") */
static PyObject *md_bq, *md_bq_empty;   /* "> ", ">" */
static PyObject *md_ul_mark;        /* "- " */
static PyObject *md_pipe;           /* " | " */
static PyObject *md_empty_tuple;

static int md_add_code(const char *name, int code)
{
    PyObject *k = PyUnicode_InternFromString(name);
    if (!k) return -1;
    PyObject *v = PyLong_FromLong(code);
    if (!v) { Py_DECREF(k); return -1; }
    int r = PyDict_SetItem(md_codes, k, v);
    Py_DECREF(k); Py_DECREF(v);
    return r;
}

static int md_init(void)
{
    if (md_ready) return 0;
    /* failure-idempotent: a prior partial failure left allocated
     * globals behind — release them before re-initializing (review
     * r8: retries leaked one dict + ~25 strings per attempt) */
    Py_CLEAR(md_codes);
    Py_CLEAR(md_space); Py_CLEAR(md_empty); Py_CLEAR(md_nl);
    Py_CLEAR(md_nl2); Py_CLEAR(md_br);
    Py_CLEAR(md_tag_b); Py_CLEAR(md_tag_li); Py_CLEAR(md_tag_cell);
    Py_CLEAR(md_ev_d); Py_CLEAR(md_ev_b);
    Py_CLEAR(md_href); Py_CLEAR(md_alt); Py_CLEAR(md_src);
    Py_CLEAR(md_name_attr); Py_CLEAR(md_hr_tuple);
    Py_CLEAR(md_s_type); Py_CLEAR(md_s_islist);
    Py_CLEAR(md_bq); Py_CLEAR(md_bq_empty); Py_CLEAR(md_ul_mark);
    Py_CLEAR(md_pipe); Py_CLEAR(md_empty_tuple);
    for (int i = 1; i <= 6; i++) Py_CLEAR(md_hpfx[i]);
    md_codes = PyDict_New();
    if (!md_codes) return -1;
    static const struct { const char *n; int c; } tbl[] = {
        {"h1", MDC_H1}, {"h2", MDC_H2}, {"h3", MDC_H3},
        {"h4", MDC_H4}, {"h5", MDC_H5}, {"h6", MDC_H6},
        {"p", MDC_P}, {"strong", MDC_WRAP2}, {"b", MDC_WRAP2},
        {"em", MDC_WRAP1}, {"i", MDC_WRAP1}, {"a", MDC_A},
        {"img", MDC_IMG}, {"br", MDC_BR}, {"hr", MDC_HR},
        {"code", MDC_CODE}, {"pre", MDC_PRE},
        {"blockquote", MDC_BLOCKQUOTE}, {"li", MDC_LI},
        {"ul", MDC_UL}, {"ol", MDC_OL}, {"td", MDC_TD},
        {"th", MDC_TH}, {"tr", MDC_TR}, {"div", MDC_DIV},
        {"script", MDC_SKIP}, {"style", MDC_SKIP},
        {"template", MDC_SKIP}, {"noscript", MDC_SKIP},
        {"head", MDC_SKIP},
        {NULL, 0},
    };
    for (int i = 0; tbl[i].n; i++)
        if (md_add_code(tbl[i].n, tbl[i].c) < 0) return -1;
    md_space = PyUnicode_InternFromString(" ");
    md_empty = PyUnicode_InternFromString("");
    md_nl = PyUnicode_InternFromString("\n");
    md_nl2 = PyUnicode_InternFromString("\n\n");
    /* _BR sentinel NUL+"br"+NUL.  Two traps here (both fuzz-caught):
     * explicit size (the leading NUL truncates PyUnicode_FromString
     * to ""), and split literals (in one literal the C lexer eats
     * "\x00b" as the single hex escape 0x0b, a vertical TAB). */
    md_br = PyUnicode_FromStringAndSize("\x00" "br" "\x00", 4);
    md_tag_b = PyUnicode_InternFromString("b");
    md_tag_li = PyUnicode_InternFromString("li");
    md_tag_cell = PyUnicode_InternFromString("cell");
    md_ev_d = PyUnicode_InternFromString("d");
    md_ev_b = PyUnicode_InternFromString("b");
    md_href = PyUnicode_InternFromString("href");
    md_alt = PyUnicode_InternFromString("alt");
    md_src = PyUnicode_InternFromString("src");
    md_name_attr = PyUnicode_InternFromString("name");
    md_s_type = PyUnicode_InternFromString("type");
    md_s_islist = PyUnicode_InternFromString("islist");
    md_bq = PyUnicode_InternFromString("> ");
    md_bq_empty = PyUnicode_InternFromString(">");
    md_ul_mark = PyUnicode_InternFromString("- ");
    md_pipe = PyUnicode_InternFromString(" | ");
    md_empty_tuple = PyTuple_New(0);
    const char *hp[7] = {NULL, "# ", "## ", "### ", "#### ",
                         "##### ", "###### "};
    for (int i = 1; i <= 6; i++)
        md_hpfx[i] = PyUnicode_InternFromString(hp[i]);
    PyObject *dashes = PyUnicode_InternFromString("---");
    md_hr_tuple = dashes ? PyTuple_Pack(2, md_tag_b, dashes) : NULL;
    Py_XDECREF(dashes);
    if (!md_space || !md_empty || !md_nl || !md_nl2 || !md_br ||
        !md_tag_b || !md_tag_li || !md_tag_cell || !md_ev_d ||
        !md_href || !md_alt || !md_src || !md_name_attr || !md_bq ||
        !md_bq_empty || !md_ul_mark || !md_pipe || !md_empty_tuple ||
        !md_hr_tuple || !md_hpfx[6] || !md_s_type || !md_s_islist)
        return -1;
    md_ready = 1;
    return 0;
}

/* " ".join(s.split()) */
static PyObject *md_collapse(PyObject *s)
{
    PyObject *parts = PyUnicode_Split(s, NULL, -1);
    if (!parts) return NULL;
    PyObject *r = PyUnicode_Join(md_space, parts);
    Py_DECREF(parts);
    return r;
}

/* _collapse(s).replace(_BR, "\n") */
static PyObject *md_collapse_br(PyObject *s)
{
    PyObject *c = md_collapse(s);
    if (!c) return NULL;
    Py_ssize_t pos = PyUnicode_Find(c, md_br, 0,
                                    PyUnicode_GET_LENGTH(c), 1);
    if (pos == -2) { Py_DECREF(c); return NULL; }
    if (pos < 0) return c;            /* no sentinel: common case */
    PyObject *r = PyUnicode_Replace(c, md_br, md_nl, -1);
    Py_DECREF(c);
    return r;
}

/* c is a non-str chunk: ("b"/"li"/"cell", text).  Borrowed refs
 * through *tag/*txt for exact tuples, new refs otherwise (flagged by
 * return 1).  -1 = error. */
static int md_chunk_parts(PyObject *c, PyObject **tag, PyObject **txt)
{
    if (PyTuple_CheckExact(c) && PyTuple_GET_SIZE(c) == 2) {
        *tag = PyTuple_GET_ITEM(c, 0);
        *txt = PyTuple_GET_ITEM(c, 1);
        return 0;
    }
    *tag = PySequence_GetItem(c, 0);
    if (!*tag) return -1;
    *txt = PySequence_GetItem(c, 1);
    if (!*txt) { Py_DECREF(*tag); return -1; }
    return 1;
}

static PyObject *md_merge_inline(PyObject *chunks, int collapse)
{
    Py_ssize_t n = PyList_GET_SIZE(chunks);
    PyObject *s;
    if (n == 1 && PyUnicode_CheckExact(PyList_GET_ITEM(chunks, 0))) {
        s = PyList_GET_ITEM(chunks, 0);
        Py_INCREF(s);
    } else {
        PyObject *parts = PyList_New(n);
        if (!parts) return NULL;
        for (Py_ssize_t i = 0; i < n; i++) {
            PyObject *c = PyList_GET_ITEM(chunks, i);
            if (PyUnicode_CheckExact(c)) {
                Py_INCREF(c);
                PyList_SET_ITEM(parts, i, c);
                continue;
            }
            PyObject *tag, *txt;
            int own = md_chunk_parts(c, &tag, &txt);
            if (own < 0) { Py_DECREF(parts); return NULL; }
            PyObject *w = PyUnicode_FromFormat("\n%U\n", txt);
            if (own) { Py_DECREF(tag); Py_DECREF(txt); }
            if (!w) { Py_DECREF(parts); return NULL; }
            PyList_SET_ITEM(parts, i, w);
        }
        s = PyUnicode_Join(md_empty, parts);
        Py_DECREF(parts);
    }
    if (!s || !collapse) return s;
    PyObject *r = md_collapse_br(s);
    Py_DECREF(s);
    return r;
}

static PyObject *md_blocks(PyObject *chunks)
{
    Py_ssize_t n = PyList_GET_SIZE(chunks);
    if (n == 1) {
        PyObject *c = PyList_GET_ITEM(chunks, 0);
        if (PyUnicode_CheckExact(c))
            return md_merge_inline(chunks, 1);
        PyObject *tag, *txt;
        int own = md_chunk_parts(c, &tag, &txt);
        if (own < 0) return NULL;
        if (!own) { Py_INCREF(txt); }
        else Py_DECREF(tag);
        return txt;
    }
    int all_inline = 1;
    for (Py_ssize_t i = 0; i < n; i++)
        if (!PyUnicode_CheckExact(PyList_GET_ITEM(chunks, i))) {
            all_inline = 0;
            break;
        }
    if (all_inline)                    /* includes n == 0 */
        return md_merge_inline(chunks, 1);
    PyObject *out = PyList_New(0);
    PyObject *run = PyList_New(0);
    if (!out || !run) goto fail;
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *c = PyList_GET_ITEM(chunks, i);
        if (PyUnicode_CheckExact(c)) {
            if (PyList_Append(run, c) < 0) goto fail;
            continue;
        }
        PyObject *lead = md_merge_inline(run, 1);
        if (!lead) goto fail;
        if (PyList_SetSlice(run, 0, PyList_GET_SIZE(run), NULL) < 0) {
            Py_DECREF(lead);
            goto fail;
        }
        if (PyUnicode_GET_LENGTH(lead) &&
            PyList_Append(out, lead) < 0) {
            Py_DECREF(lead);
            goto fail;
        }
        Py_DECREF(lead);
        PyObject *tag, *txt;
        int own = md_chunk_parts(c, &tag, &txt);
        if (own < 0) goto fail;
        int add = PyUnicode_Check(txt) ?
            (PyUnicode_GET_LENGTH(txt) != 0) : PyObject_IsTrue(txt);
        if (add < 0 || (add && PyList_Append(out, txt) < 0)) {
            if (own) { Py_DECREF(tag); Py_DECREF(txt); }
            goto fail;
        }
        if (own) { Py_DECREF(tag); Py_DECREF(txt); }
    }
    {
        PyObject *tail = md_merge_inline(run, 1);
        if (!tail) goto fail;
        if (PyUnicode_GET_LENGTH(tail) &&
            PyList_Append(out, tail) < 0) {
            Py_DECREF(tail);
            goto fail;
        }
        Py_DECREF(tail);
    }
    {
        PyObject *r = PyUnicode_Join(md_nl2, out);
        Py_DECREF(out); Py_DECREF(run);
        return r;
    }
fail:
    Py_XDECREF(out); Py_XDECREF(run);
    return NULL;
}

/* lines[0] + subsequent non-empty lines prefixed with pad */
static PyObject *md_indent(PyObject *text, PyObject *pad)
{
    PyObject *lines = PyUnicode_Split(text, md_nl, -1);
    if (!lines) return NULL;
    Py_ssize_t n = PyList_GET_SIZE(lines);
    for (Py_ssize_t i = 1; i < n; i++) {
        PyObject *l = PyList_GET_ITEM(lines, i);
        if (!PyUnicode_GET_LENGTH(l)) continue;
        PyObject *w = PyUnicode_Concat(pad, l);
        if (!w) { Py_DECREF(lines); return NULL; }
        PyList_SetItem(lines, i, w);   /* steals w, drops l */
    }
    PyObject *r = PyUnicode_Join(md_nl, lines);
    Py_DECREF(lines);
    return r;
}

/* _attr(attrs, name): first pair with k == name -> str(v) (new ref);
 * NULL with no exception set = attribute absent. */
static PyObject *md_attr(PyObject *attrs, PyObject *name)
{
    PyObject *fast = PySequence_Fast(attrs, "md attrs");
    if (!fast) return NULL;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
    PyObject **items = PySequence_Fast_ITEMS(fast);
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *pair = items[i];
        PyObject *k, *v;
        if (PyTuple_CheckExact(pair) && PyTuple_GET_SIZE(pair) == 2) {
            k = PyTuple_GET_ITEM(pair, 0);
            v = PyTuple_GET_ITEM(pair, 1);
        } else
            continue;
        if (!PyUnicode_Check(k) || PyUnicode_Compare(k, name) != 0)
            continue;
        PyObject *r = PyUnicode_Check(v) ? (Py_INCREF(v), v)
                                         : PyObject_Str(v);
        Py_DECREF(fast);
        return r;
    }
    Py_DECREF(fast);
    return NULL;
}

static int md_str_eq(PyObject *a, PyObject *b)
{
    if (a == b) return 1;
    if (!PyUnicode_Check(a) || !PyUnicode_Check(b)) return 0;
    return PyUnicode_Compare(a, b) == 0;
}

static int md_extend(PyObject *out, PyObject *src)
{
    Py_ssize_t n = PyList_GET_SIZE(out);
    return PyList_SetSlice(out, n, n, src);
}

/* append ("tag", txt) to out; steals txt */
static int md_append_tagged(PyObject *out, PyObject *tag, PyObject *txt)
{
    PyObject *t = PyTuple_Pack(2, tag, txt);
    Py_DECREF(txt);
    if (!t) return -1;
    int r = PyList_Append(out, t);
    Py_DECREF(t);
    return r;
}

/* _fold(fname, attrs, chunks, in_pre) appended into out.  Mirrors
 * markdown.py _fold rule for rule — keep the two in lockstep. */
static int md_fold_into(int code, PyObject *attrs, PyObject *chunks,
                        int in_pre, PyObject *out)
{
    if (in_pre && code != MDC_PRE) {
        if (code == MDC_BR)
            return PyList_Append(out, md_nl);
        if (MD_PRE_LINE(code)) {
            if (md_extend(out, chunks) < 0) return -1;
            return PyList_Append(out, md_nl);
        }
        return md_extend(out, chunks);
    }
    switch (code) {
    case MDC_H1: case MDC_H2: case MDC_H3:
    case MDC_H4: case MDC_H5: case MDC_H6: {
        PyObject *t = md_merge_inline(chunks, 1);
        if (!t) return -1;
        PyObject *h = PyUnicode_Concat(md_hpfx[code], t);
        Py_DECREF(t);
        if (!h) return -1;
        return md_append_tagged(out, md_tag_b, h);
    }
    case MDC_P: {
        PyObject *t = md_blocks(chunks);
        if (!t) return -1;
        if (!PyUnicode_GET_LENGTH(t)) { Py_DECREF(t); return 0; }
        return md_append_tagged(out, md_tag_b, t);
    }
    case MDC_WRAP2: case MDC_WRAP1: {
        PyObject *t;
        if (PyList_GET_SIZE(chunks) == 1 &&
            PyUnicode_CheckExact(PyList_GET_ITEM(chunks, 0)))
            t = md_collapse_br(PyList_GET_ITEM(chunks, 0));
        else
            t = md_merge_inline(chunks, 1);
        if (!t) return -1;
        if (!PyUnicode_GET_LENGTH(t)) { Py_DECREF(t); return 0; }
        PyObject *w = (code == MDC_WRAP2)
            ? PyUnicode_FromFormat("**%U**", t)
            : PyUnicode_FromFormat("*%U*", t);
        Py_DECREF(t);
        if (!w) return -1;
        int r = PyList_Append(out, w);
        Py_DECREF(w);
        return r;
    }
    case MDC_A: {
        PyObject *t;
        if (PyList_GET_SIZE(chunks) == 1 &&
            PyUnicode_CheckExact(PyList_GET_ITEM(chunks, 0)))
            t = md_collapse_br(PyList_GET_ITEM(chunks, 0));
        else
            t = md_merge_inline(chunks, 1);
        if (!t) return -1;
        PyObject *href = md_attr(attrs, md_href);
        if (!href && PyErr_Occurred()) { Py_DECREF(t); return -1; }
        int href_true = href && PyUnicode_GET_LENGTH(href);
        if (!PyUnicode_GET_LENGTH(t)) {
            /* t = href or "" */
            Py_DECREF(t);
            if (href_true) { t = href; Py_INCREF(t); }
            else { t = md_empty; Py_INCREF(t); }
        }
        PyObject *res;
        if (href_true)
            res = PyUnicode_FromFormat("[%U](%U)", t, href);
        else {
            res = t;
            Py_INCREF(res);
        }
        Py_DECREF(t);
        Py_XDECREF(href);
        if (!res) return -1;
        int r = PyList_Append(out, res);
        Py_DECREF(res);
        return r;
    }
    case MDC_IMG: {
        PyObject *alt = md_attr(attrs, md_alt);
        if (!alt) {
            if (PyErr_Occurred()) return -1;
            alt = md_empty; Py_INCREF(alt);
        }
        PyObject *src = md_attr(attrs, md_src);
        if (!src) {
            if (PyErr_Occurred()) { Py_DECREF(alt); return -1; }
            src = md_empty; Py_INCREF(src);
        }
        PyObject *res = PyUnicode_FromFormat("![%U](%U)", alt, src);
        Py_DECREF(alt); Py_DECREF(src);
        if (!res) return -1;
        int r = PyList_Append(out, res);
        Py_DECREF(res);
        return r;
    }
    case MDC_BR:
        return PyList_Append(out, md_br);
    case MDC_HR:
        return PyList_Append(out, md_hr_tuple);
    case MDC_CODE: {
        PyObject *t = md_merge_inline(chunks, 1);
        if (!t) return -1;
        if (!PyUnicode_GET_LENGTH(t)) { Py_DECREF(t); return 0; }
        PyObject *w = PyUnicode_FromFormat("`%U`", t);
        Py_DECREF(t);
        if (!w) return -1;
        int r = PyList_Append(out, w);
        Py_DECREF(w);
        return r;
    }
    case MDC_PRE: {
        PyObject *raw = md_merge_inline(chunks, 0);
        if (!raw) return -1;
        PyObject *stripped = PyObject_CallMethod(raw, "strip", "s",
                                                 "\n");
        Py_DECREF(raw);
        if (!stripped) return -1;
        PyObject *body = PyUnicode_FromFormat("```\n%U\n```",
                                              stripped);
        Py_DECREF(stripped);
        if (!body) return -1;
        return md_append_tagged(out, md_tag_b, body);
    }
    case MDC_BLOCKQUOTE: {
        PyObject *body = md_blocks(chunks);
        if (!body) return -1;
        PyObject *lines = PyUnicode_Split(body, md_nl, -1);
        Py_DECREF(body);
        if (!lines) return -1;
        Py_ssize_t n = PyList_GET_SIZE(lines);
        for (Py_ssize_t i = 0; i < n; i++) {
            PyObject *l = PyList_GET_ITEM(lines, i);
            PyObject *w;
            if (PyUnicode_GET_LENGTH(l))
                w = PyUnicode_Concat(md_bq, l);
            else {
                w = md_bq_empty;
                Py_INCREF(w);
            }
            if (!w) { Py_DECREF(lines); return -1; }
            PyList_SetItem(lines, i, w);
        }
        PyObject *joined = PyUnicode_Join(md_nl, lines);
        Py_DECREF(lines);
        if (!joined) return -1;
        return md_append_tagged(out, md_tag_b, joined);
    }
    case MDC_LI: {
        PyObject *b = md_blocks(chunks);
        if (!b) return -1;
        PyObject *t = PyUnicode_Replace(b, md_nl2, md_nl, -1);
        Py_DECREF(b);
        if (!t) return -1;
        return md_append_tagged(out, md_tag_li, t);
    }
    case MDC_UL: case MDC_OL: {
        PyObject *items = PyList_New(0);
        if (!items) return -1;
        long cnt = 0;
        Py_ssize_t n = PyList_GET_SIZE(chunks);
        for (Py_ssize_t i = 0; i < n; i++) {
            PyObject *c = PyList_GET_ITEM(chunks, i);
            if (PyUnicode_CheckExact(c)) continue;
            PyObject *tag, *txt;
            int own = md_chunk_parts(c, &tag, &txt);
            if (own < 0) { Py_DECREF(items); return -1; }
            if (!md_str_eq(tag, md_tag_li)) {
                if (own) { Py_DECREF(tag); Py_DECREF(txt); }
                continue;
            }
            cnt++;
            PyObject *mark = (code == MDC_UL)
                ? (Py_INCREF(md_ul_mark), md_ul_mark)
                : PyUnicode_FromFormat("%ld. ", cnt);
            if (!mark) {
                if (own) { Py_DECREF(tag); Py_DECREF(txt); }
                Py_DECREF(items);
                return -1;
            }
            PyObject *pad = PySequence_Repeat(
                md_space, PyUnicode_GET_LENGTH(mark));
            PyObject *ind = pad ? md_indent(txt, pad) : NULL;
            Py_XDECREF(pad);
            if (own) { Py_DECREF(tag); Py_DECREF(txt); }
            PyObject *item = ind ? PyUnicode_Concat(mark, ind) : NULL;
            Py_XDECREF(ind);
            Py_DECREF(mark);
            if (!item || PyList_Append(items, item) < 0) {
                Py_XDECREF(item);
                Py_DECREF(items);
                return -1;
            }
            Py_DECREF(item);
        }
        if (!PyList_GET_SIZE(items)) { Py_DECREF(items); return 0; }
        PyObject *joined = PyUnicode_Join(md_nl, items);
        Py_DECREF(items);
        if (!joined) return -1;
        return md_append_tagged(out, md_tag_b, joined);
    }
    case MDC_TD: case MDC_TH: {
        PyObject *t = md_merge_inline(chunks, 1);
        if (!t) return -1;
        return md_append_tagged(out, md_tag_cell, t);
    }
    case MDC_TR: {
        PyObject *cells = PyList_New(0);
        if (!cells) return -1;
        Py_ssize_t n = PyList_GET_SIZE(chunks);
        for (Py_ssize_t i = 0; i < n; i++) {
            PyObject *c = PyList_GET_ITEM(chunks, i);
            if (PyUnicode_CheckExact(c)) continue;
            PyObject *tag, *txt;
            int own = md_chunk_parts(c, &tag, &txt);
            if (own < 0) { Py_DECREF(cells); return -1; }
            int is_cell = md_str_eq(tag, md_tag_cell);
            if (is_cell && PyList_Append(cells, txt) < 0) {
                if (own) { Py_DECREF(tag); Py_DECREF(txt); }
                Py_DECREF(cells);
                return -1;
            }
            if (own) { Py_DECREF(tag); Py_DECREF(txt); }
        }
        if (PyList_GET_SIZE(cells)) {
            PyObject *joined = PyUnicode_Join(md_pipe, cells);
            Py_DECREF(cells);
            if (!joined) return -1;
            return md_append_tagged(out, md_tag_b, joined);
        }
        Py_DECREF(cells);
        /* no cells: every chunk passes the not-a-cell filter */
        return md_extend(out, chunks);
    }
    default:
        return md_extend(out, chunks);
    }
}

/* fold-name code for a frame's fname (0 = transparent) */
static int md_code_of(PyObject *fname)
{
    PyObject *v = PyDict_GetItemWithError(md_codes, fname);
    if (v) return (int)PyLong_AS_LONG(v);
    return PyErr_Occurred() ? -1 : MDC_TRANSPARENT;
}

/* _fold_name(e.name): str-coerce, strip to after last ':', lower */
static PyObject *md_fold_name(PyObject *e)
{
    PyObject *raw = PyObject_GetAttr(e, md_name_attr);
    if (!raw) return NULL;
    PyObject *name = PyUnicode_Check(raw) ? raw : PyObject_Str(raw);
    if (name != raw) Py_DECREF(raw);
    if (!name) return NULL;
    Py_ssize_t len = PyUnicode_GET_LENGTH(name);
    Py_ssize_t colon = PyUnicode_FindChar(name, ':', 0, len, -1);
    if (colon >= 0) {
        PyObject *sub = PyUnicode_Substring(name, colon + 1, len);
        Py_DECREF(name);
        if (!sub) return NULL;
        name = sub;
    }
    PyObject *lower = PyObject_CallMethod(name, "lower", NULL);
    Py_DECREF(name);
    return lower;
}

/* Inline fast path for parser.convert_attributes on the a/img begin
 * events (the only fold rules that read attributes): every (a, v)
 * pair whose attr def is scalar CDATA (type == AT_CDATA == 0, islist
 * falsy) maps to (a.name, v if v is not None else "") — the exact
 * convert_attributes CDATA branch.  Any other shape (declared
 * NUMBER/NAMES/... attr, unexpected item) falls back to the Python
 * callable for the WHOLE list so ordering and typing stay identical.
 *
 * The id-keyed memo (att_fold: id(attr def) -> name str, or None for
 * "complex type") CANNOT go stale — deliberately unlike the CElem
 * element flags: process_attlist_declaration always builds a FRESH
 * Attr before attaching it (decls.py), implicit attrs are created
 * CDATA and never re-typed in place, and att_keep pins every
 * memoized def so a dead def's id is never reused. */
static PyObject *md_convert_atts(PyObject *convert, PyObject *atts,
                                 PyObject *att_fold, PyObject *att_keep)
{
    if (!att_fold || !PyList_CheckExact(atts))
        return PyObject_CallFunctionObjArgs(convert, atts, NULL);
    Py_ssize_t n = PyList_GET_SIZE(atts);
    PyObject *out = PyList_New(n);
    if (!out) return NULL;
    for (Py_ssize_t j = 0; j < n; j++) {
        PyObject *item = PyList_GET_ITEM(atts, j);
        if (!PyTuple_CheckExact(item) || PyTuple_GET_SIZE(item) != 2)
            goto fallback;
        PyObject *a = PyTuple_GET_ITEM(item, 0);
        PyObject *v = PyTuple_GET_ITEM(item, 1);
        PyObject *key = PyLong_FromVoidPtr(a);
        if (!key) goto error;
        PyObject *name = PyDict_GetItemWithError(att_fold, key);
        int owned = 0;
        if (!name) {
            if (PyErr_Occurred()) { Py_DECREF(key); goto error; }
            PyObject *t = PyObject_GetAttr(a, md_s_type);
            if (!t) { Py_DECREF(key); goto error; }
            int simple = 0;
            if (PyLong_CheckExact(t)) {
                long tv = PyLong_AsLong(t);
                if (tv == -1 && PyErr_Occurred()) PyErr_Clear();
                simple = tv == 0;               /* AT_CDATA */
            }
            Py_DECREF(t);
            if (simple) {
                PyObject *il = PyObject_GetAttr(a, md_s_islist);
                if (!il) { Py_DECREF(key); goto error; }
                int lt = PyObject_IsTrue(il);
                Py_DECREF(il);
                if (lt < 0) { Py_DECREF(key); goto error; }
                if (lt) simple = 0;
            }
            if (simple) {
                name = PyObject_GetAttr(a, md_name_attr);
                if (!name) { Py_DECREF(key); goto error; }
                if (!PyUnicode_CheckExact(name)) {
                    /* convert would emit the non-str name verbatim;
                     * rare enough to route through Python */
                    Py_DECREF(name);
                    name = NULL;
                } else
                    owned = 1;
            }
            if (PyDict_GET_SIZE(att_fold) < 4096 &&
                (PyDict_SetItem(att_fold, key,
                                name ? name : Py_None) < 0 ||
                 PyList_Append(att_keep, a) < 0)) {
                if (owned) Py_DECREF(name);
                Py_DECREF(key);
                goto error;
            }
        } else if (name == Py_None)
            name = NULL;
        Py_DECREF(key);
        if (!name)
            goto fallback;
        PyObject *vv = (v == Py_None) ? md_empty : v;
        PyObject *tup = PyTuple_Pack(2, name, vv);
        if (owned) Py_DECREF(name);
        if (!tup) goto error;
        PyList_SET_ITEM(out, j, tup);
    }
    return out;
fallback:
    Py_DECREF(out);
    return PyObject_CallFunctionObjArgs(convert, atts, NULL);
error:
    Py_DECREF(out);
    return NULL;
}

static PyObject *md_drain_impl(PyObject *self, PyObject *args)
{
    (void)self;
    PyObject *tape, *frames, *mds, *convert, *def_fold, *def_keep;
    PyObject *skip_box = NULL, *att_fold = NULL, *att_keep = NULL;
    long skip;
    if (!PyArg_ParseTuple(args, "O!O!O!lOO!O!|O!O!O!",
                          &PyList_Type, &tape,
                          &PyList_Type, &frames,
                          &PyList_Type, &mds,
                          &skip, &convert,
                          &PyDict_Type, &def_fold,
                          &PyList_Type, &def_keep,
                          &PyList_Type, &skip_box,
                          &PyDict_Type, &att_fold,
                          &PyList_Type, &att_keep))
        return NULL;
    if (!att_keep)
        att_fold = NULL;   /* memo needs its keep-alive pin */
    if (md_init() < 0) return NULL;
    /* skip_box: optional 1-slot list the caller reads in its finally
     * clause — published at every skip change so an exception
     * mid-tape leaves self._skip consistent with the frames already
     * mutated (review r8: the pure-Python arm writes its partial
     * skip back; the C arm must match) */
#define MD_PUBLISH_SKIP() do { \
        if (skip_box && PyList_GET_SIZE(skip_box) == 1) { \
            PyObject *_sv = PyLong_FromLong(skip); \
            if (_sv) PyList_SetItem(skip_box, 0, _sv); \
        } \
    } while (0)

    Py_ssize_t nev = PyList_GET_SIZE(tape);
    for (Py_ssize_t ti = 0; ti < nev; ti++) {
        PyObject *ev = PyList_GET_ITEM(tape, ti);
        if (!PyTuple_CheckExact(ev) || PyTuple_GET_SIZE(ev) < 2) {
            /* every event the drain reads is at least ("k", arg) —
             * the <1 guard did not protect the GET_ITEM(ev, 1)
             * reads below (review r8).  Bare end markers would be
             * 1-tuples, but tape_end always carries the name. */
            PyErr_SetString(PyExc_SystemError,
                            "md_drain: malformed tape event");
            return NULL;
        }
        PyObject *k = PyTuple_GET_ITEM(ev, 0);
        if (k == md_ev_d || (k != md_ev_b && md_str_eq(k, md_ev_d))) {
            /* ("d", s, ...) */
            if (skip) continue;
            PyObject *s = PyTuple_GET_ITEM(ev, 1);
            if (!PyUnicode_Check(s)) {
                PyErr_SetString(PyExc_SystemError,
                                "md_drain: non-str data event");
                return NULL;
            }
            Py_ssize_t nf = PyList_GET_SIZE(frames);
            if (nf) {
                if (PyUnicode_GET_LENGTH(s)) {
                    PyObject *chunks = PyList_GET_ITEM(
                        PyList_GET_ITEM(frames, nf - 1), 2);
                    if (PyList_Append(chunks, s) < 0) return NULL;
                }
            } else if (PyUnicode_GET_LENGTH(s)) {
                PyObject *md = md_collapse(s);
                if (!md) return NULL;
                if (PyUnicode_GET_LENGTH(md) &&
                    PyList_Append(mds, md) < 0) {
                    Py_DECREF(md);
                    return NULL;
                }
                Py_DECREF(md);
            }
        } else if (md_str_eq(k, md_ev_b)) {
            /* ("b", entry, ...) with entry = ('b', e, atts, ...) */
            if (skip) { skip++; MD_PUBLISH_SKIP(); continue; }
            PyObject *entry = PyTuple_GET_ITEM(ev, 1);
            if (!PyTuple_CheckExact(entry) ||
                PyTuple_GET_SIZE(entry) < 3) {
                PyErr_SetString(PyExc_SystemError,
                                "md_drain: malformed begin entry");
                return NULL;
            }
            PyObject *e = PyTuple_GET_ITEM(entry, 1);
            PyObject *atts = PyTuple_GET_ITEM(entry, 2);
            PyObject *key = PyLong_FromVoidPtr(e);   /* == id(e) */
            if (!key) return NULL;
            PyObject *fname = PyDict_GetItemWithError(def_fold, key);
            if (fname)
                Py_INCREF(fname);
            else {
                if (PyErr_Occurred()) { Py_DECREF(key); return NULL; }
                fname = md_fold_name(e);    /* owned */
                if (!fname) { Py_DECREF(key); return NULL; }
                if (PyDict_GET_SIZE(def_fold) < 4096 &&
                    (PyDict_SetItem(def_fold, key, fname) < 0 ||
                     PyList_Append(def_keep, e) < 0)) {
                    Py_DECREF(key); Py_DECREF(fname);
                    return NULL;
                }
            }
            Py_DECREF(key);
            int code = md_code_of(fname);
            if (code < 0) { Py_DECREF(fname); return NULL; }
            Py_ssize_t nf = PyList_GET_SIZE(frames);
            int in_pre;
            if (nf) {
                if (code == MDC_SKIP) {
                    skip = 1;
                    MD_PUBLISH_SKIP();
                    Py_DECREF(fname);
                    continue;
                }
                PyObject *top = PyList_GET_ITEM(frames, nf - 1);
                in_pre = (PyList_GET_ITEM(top, 3) == Py_True) ||
                         code == MDC_PRE;
            } else
                in_pre = code == MDC_PRE;
            PyObject *attrs;
            int want = (code == MDC_A || code == MDC_IMG);
            int atts_true = want ? PyObject_IsTrue(atts) : 0;
            if (atts_true < 0) { Py_DECREF(fname); return NULL; }
            if (want && atts_true) {
                attrs = md_convert_atts(convert, atts, att_fold,
                                        att_keep);
                if (!attrs) { Py_DECREF(fname); return NULL; }
            } else {
                attrs = md_empty_tuple;
                Py_INCREF(attrs);
            }
            PyObject *chunks = PyList_New(0);
            PyObject *frame = chunks ? PyList_New(4) : NULL;
            if (!frame) {
                Py_XDECREF(chunks); Py_DECREF(attrs);
                Py_DECREF(fname);
                return NULL;
            }
            PyList_SET_ITEM(frame, 0, fname);         /* steals */
            PyList_SET_ITEM(frame, 1, attrs);
            PyList_SET_ITEM(frame, 2, chunks);
            PyObject *pre = in_pre ? Py_True : Py_False;
            Py_INCREF(pre);
            PyList_SET_ITEM(frame, 3, pre);
            int r = PyList_Append(frames, frame);
            Py_DECREF(frame);
            if (r < 0) return NULL;
        } else {
            /* ("e", name) */
            if (skip) { skip--; MD_PUBLISH_SKIP(); continue; }
            Py_ssize_t nf = PyList_GET_SIZE(frames);
            if (!nf) {
                PyErr_SetString(PyExc_SystemError,
                                "md_drain: end with no open frame");
                return NULL;
            }
            PyObject *frame = PyList_GET_ITEM(frames, nf - 1);
            Py_INCREF(frame);
            if (PyList_SetSlice(frames, nf - 1, nf, NULL) < 0) {
                Py_DECREF(frame);
                return NULL;
            }
            PyObject *fname = PyList_GET_ITEM(frame, 0);
            PyObject *attrs = PyList_GET_ITEM(frame, 1);
            PyObject *chunks = PyList_GET_ITEM(frame, 2);
            nf--;
            int parent_pre = nf &&
                PyList_GET_ITEM(PyList_GET_ITEM(frames, nf - 1), 3)
                    == Py_True;
            int code = md_code_of(fname);
            if (code < 0) { Py_DECREF(frame); return NULL; }
            int special = parent_pre || MD_SPECIAL(code);
            if (nf) {
                PyObject *pchunks = PyList_GET_ITEM(
                    PyList_GET_ITEM(frames, nf - 1), 2);
                int r = special
                    ? md_fold_into(code, attrs, chunks, parent_pre,
                                   pchunks)
                    : md_extend(pchunks, chunks);
                Py_DECREF(frame);
                if (r < 0) return NULL;
            } else {
                PyObject *folded;
                if (special) {
                    folded = PyList_New(0);
                    if (!folded ||
                        md_fold_into(code, attrs, chunks, parent_pre,
                                     folded) < 0) {
                        Py_XDECREF(folded);
                        Py_DECREF(frame);
                        return NULL;
                    }
                } else {
                    folded = chunks;
                    Py_INCREF(folded);
                }
                PyObject *md = md_blocks(folded);
                Py_DECREF(folded);
                Py_DECREF(frame);
                if (!md) return NULL;
                if (PyUnicode_GET_LENGTH(md) &&
                    PyList_Append(mds, md) < 0) {
                    Py_DECREF(md);
                    return NULL;
                }
                Py_DECREF(md);
            }
        }
    }
    MD_PUBLISH_SKIP();
#undef MD_PUBLISH_SKIP
    return PyLong_FromLong(skip);
}

static PyMethodDef methods[] = {
    {"make_ctx", make_ctx, METH_VARARGS,
     "make_ctx(dtd, consts, callbacks) -> Ctx"},
    {"md_drain", md_drain_impl, METH_VARARGS,
     "md_drain(tape, frames, mds, skip, convert, def_fold, def_keep"
     "[, skip_box[, att_fold, att_keep]]) -> new skip"},
    {"pcdata_fast", pcdata_fast, METH_VARARGS,
     "pcdata_fast(ctx, parser, text, i, n, utf8) -> new_i or -1"},
    {"ctx_stats", ctx_stats, METH_VARARGS,
     "ctx_stats(ctx) -> registry sizes (bounded-growth observability)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_sgml_cspeed",
    "compiled steady-state PCDATA executor", -1, methods,
    NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit__sgml_cspeed(void)
{
    if (PyType_Ready(&Ctx_Type) < 0) return NULL;
    return PyModule_Create(&moduledef);
}
