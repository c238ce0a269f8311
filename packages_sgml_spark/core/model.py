"""Content-model automaton.

Semantics mirror /root/reference/model.c (lazy ε-NFA with on-demand
AND-group expansion, model.c:44-76 design note).  Transition lists are
built by *prepending* (link(), model.c:296-304) and traversed
head-first, so omitted-tag inference order (find_omitted_path DFS,
model.c:236-285) matches the reference exactly.

Model element references are dtd.Element objects (interned per name in
the DTD symbol table, parser.c:312-386), so transition matching is
identity-based like the reference's pointer equality.
"""

from typing import List, Optional


class _CdataElement:
    """Sentinel pseudo-element for #PCDATA transitions (reference's
    CDATA_ELEMENT)."""
    structure = None
    undefined = False

    def __repr__(self):
        return "#PCDATA"


CDATA_ELEMENT = _CdataElement()

# model types
MT_UNDEF, MT_PCDATA, MT_ELEMENT, MT_SEQ, MT_AND, MT_OR = range(6)
# cardinalities
MC_ONE, MC_OPT, MC_REP, MC_PLUS = range(4)
# content types
C_EMPTY, C_CDATA, C_RCDATA, C_ANY, C_PCDATA = range(5)

MAX_VISITED = 256
MAXOMITTED = 32

# Cache generations are PER-DTD (dtd._omit_gen / dtd._allow_gen,
# one-slot lists so the compiled executor can watch them by
# identity).  They used to be process-global, which made every
# private-DTD undefined-element flip (one per element of every
# DTD-less XML document) flush the *shared* html5 registries too —
# a measured ~30% html5-throughput loss on mixed html+xml corpora.
# A DTD's elements/states/attrs are never shared with another DTD
# (private_dtd_copy rebuilds from scratch), so per-DTD stamping is
# exact.
#
# _omit_gen — find_omitted_path cache generation: unlike the
# transition/same_state memos (pure graph reachability, unaffected
# by redeclaration), the omitted-path DFS reads other elements'
# omit_open flags and builds their engines, so an ELEMENT
# (re)declaration can change its result.
# DeclMixin._invalidate_replay_caches bumps this; stale-generation
# memos are discarded lazily.
#
# _allow_gen — bumped by DtdCow.rollback when undefined-element
# flips were rolled back WITHOUT an _omit_gen bump (the cheap
# shared-DTD soup path): the compiled executor's (parent, child)
# allow_for-membership cache is the one registry whose entries those
# rollbacks invalidate — the next parse re-flips the element with a
# FRESH empty ElementDef, so a stale positive would skip allow_for
# and leave the new model empty (observable through
# make_state_engine).  Everything else the executor caches about
# flipped elements is rollback-stable.


class Model:
    __slots__ = ("type", "cardinality", "element", "group")

    def __init__(self, type_=MT_UNDEF, cardinality=MC_ONE):
        self.type = type_
        self.cardinality = cardinality
        self.element = None      # dtd.Element for MT_ELEMENT
        self.group: List["Model"] = []


class State:
    __slots__ = ("transitions", "expander", "memo", "same_memo",
                 "omit_memo")

    def __init__(self):
        self.transitions = None   # None = unexpanded; list of (elem, State)
        self.expander = None      # (target_state, [Model, ...]) for AND groups
        self.memo = None          # {element_id: State|None} transition cache
        self.same_memo = None     # {final_id: bool} same_state cache
        self.omit_memo = None     # (OMIT_GEN, {element_id: list|None})
                                  # generation-stamped omitted-path cache


def link(frm: State, to: State, elem) -> None:
    """Prepend a transition (model.c:296-304 conses LIFO)."""
    if frm.transitions is None:
        frm.transitions = []
    frm.transitions.insert(0, (elem, to))


def state_transitions(state: State):
    """Lazy AND expansion (model.c:323-357)."""
    if state.transitions is None and state.expander is not None:
        target, models = state.expander
        state.transitions = []
        if not models:
            link(state, target, None)
        elif len(models) == 1:
            translate_model(models[0], state, target)
        else:
            for left in models:
                tmp = State()
                translate_model(left, state, tmp)
                rest = [m for m in models if m is not left]
                tmp.expander = (target, rest)
    return state.transitions or ()


def translate_one(m: Model, frm: State, to: State) -> None:
    if m.type == MT_ELEMENT:
        link(frm, to, m.element)
    elif m.type == MT_SEQ:
        cur = frm
        for sub in m.group[:-1]:
            tmp = State()
            translate_model(sub, cur, tmp)
            cur = tmp
        translate_model(m.group[-1], cur, to)
    elif m.type == MT_AND:
        frm.expander = (to, list(m.group))
    elif m.type == MT_OR:
        for sub in m.group:
            translate_model(sub, frm, to)


def translate_model(m: Model, frm: State, to: State) -> None:
    """model.c:413-437."""
    if m.type == MT_PCDATA:
        link(frm, frm, CDATA_ELEMENT)
        link(frm, to, None)
        return
    card = m.cardinality
    if card == MC_OPT:
        link(frm, to, None)
        translate_one(m, frm, to)
    elif card == MC_ONE:
        translate_one(m, frm, to)
    elif card == MC_REP:
        translate_one(m, frm, frm)
        link(frm, to, None)
    elif card == MC_PLUS:
        translate_one(m, frm, to)
        translate_one(m, to, to)


def make_state_engine(e) -> Optional[State]:
    """model.c:441-465.  `e` is a dtd.Element (uses e.structure)."""
    edef = e.structure
    if edef is None:
        return None
    if edef.initial_state is None:
        if edef.content is not None:
            edef.initial_state = State()
            edef.final_state = State()
            translate_model(edef.content, edef.initial_state, edef.final_state)
        elif edef.type in (C_CDATA, C_RCDATA):
            edef.initial_state = State()
            edef.final_state = State()
            link(edef.initial_state, edef.initial_state, CDATA_ELEMENT)
            link(edef.initial_state, edef.final_state, None)
        else:
            return None
    return edef.initial_state


def _visit(state, visited) -> bool:
    for s in visited:
        if s is state:
            return False
    if len(visited) >= MAX_VISITED:
        return False
    visited.append(state)
    return True


def make_dtd_transition(here: Optional[State], e) -> Optional[State]:
    """ε-closure transition step (model.c:132-164).  Results are
    memoized per state — transition sets are immutable once lazily
    expanded, so the cache is exact."""
    if here is None:
        return None
    memo = here.memo
    key = id(e)
    if memo is not None:
        try:
            return memo[key]
        except KeyError:
            pass
    visited = []

    def walk(state):
        tset = state_transitions(state)
        for elem, st in tset:
            if elem is e:
                return st
        for elem, st in tset:
            if elem is None and _visit(st, visited):
                new = walk(st)
                if new is not None:
                    return new
        return None

    result = walk(here)
    if memo is None:
        here.memo = {key: result}
    else:
        memo[key] = result
    return result


def same_state(final: State, here: State) -> bool:
    """model.c:185-200: final reachable via ε only.  Memoized like
    make_dtd_transition."""
    memo = here.same_memo
    key = id(final)
    if memo is not None:
        try:
            return memo[key]
        except KeyError:
            pass
    visited = []

    def walk(state):
        if state is final:
            return True
        for elem, st in state_transitions(state):
            if elem is None and _visit(st, visited):
                if walk(st):
                    return True
        return False

    result = walk(here)
    if memo is None:
        here.same_memo = {key: result}
    else:
        memo[key] = result
    return result


def find_omitted_path(state: Optional[State], e,
                      gen_list) -> Optional[list]:
    """DFS for a chain of omit-open elements reaching e
    (model.c:236-285).  Returns list of Elements to open, or None.

    Memoized per state like make_dtd_transition/same_state, but
    generation-stamped: the DFS reads other elements' omit_open flags
    and content models, which an ELEMENT (re)declaration can change —
    DeclMixin._invalidate_replay_caches bumps the owning DTD's
    ``_omit_gen`` and stale memos are discarded here.  ``gen_list``
    must be the one-slot ``dtd._omit_gen`` of the DTD that owns
    ``state``/``e`` (the compiled executor passes it via a per-ctx
    closure).  Callers only iterate the result, never mutate it."""
    if state is None:
        return None
    gen = gen_list[0]
    memo_entry = state.omit_memo
    memo = None
    if memo_entry is not None:
        mgen, memo = memo_entry
        if mgen != gen:
            memo = None
    key = id(e)
    if memo is not None:
        try:
            return memo[key]
        except KeyError:
            pass
    visited = []
    path = []

    def walk(st):
        tset = state_transitions(st)
        for elem, t_st in tset:
            if elem is e:
                return True
            if (elem is not None and elem is not CDATA_ELEMENT and
                    elem.structure is not None and elem.structure.omit_open and
                    _visit(t_st, visited) and len(path) < MAXOMITTED):
                initial = make_state_engine(elem)
                path.append(elem)
                if initial is not None and walk(initial):
                    return True
                path.pop()
        for elem, t_st in tset:
            if elem is None and _visit(t_st, visited):
                if walk(t_st):
                    return True
        return False

    result = path if walk(state) else None
    if memo is None:
        state.omit_memo = (gen, {key: result})
    else:
        memo[key] = result
    return result
