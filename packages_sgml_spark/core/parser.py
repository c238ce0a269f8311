"""SGML/XML/HTML parser engine.

A from-scratch Python implementation of the parsing semantics of
SWI-Prolog packages-sgml's C core: the 29-state tokenizer FSM
(/root/reference/parser.c:4847-5349), element-stack validation with
omitted-tag inference (parser.c:2691-3063), entity machinery
(parser.c:419-678, 4475-4589), CDATA space-mode handling
(parser.c:4203-4470, 4758-4846), shortref maps (parser.c:1890-1971),
and marked sections (parser.c:4131-4197).

This is *not* a code port: it is a re-implementation of observable
behaviour (DOM shape, extracted text bytes, error list) validated
against the reference's own Test/ golden corpus.

Input is fed as raw octets (latin-1-decoded str); UTF-8 assembly is a
sub-state of the FSM exactly as in the reference (parser.c:4862-4877),
so malformed UTF-8 recovers identically.
"""

from . import dtd as D
from . import model as M
from .chars import is_blank_char, is_name_char, is_nmstart_char
from .decls import DeclMixin
from .dom import Element, SData, NData, PI, QName
from .entities import (XML_ENTITY_DECLS, isee_character_entity, safe_chr)
from .errors import Gripes, ParseError, ERROR, STYLE
from .states import (
    S_PCDATA, S_CDATA, S_RCDATA, S_MSCDATA, S_EMSCDATA1, S_EMSCDATA2,
    S_ECDATA1, S_ECDATA2, S_EMSC1, S_EMSC2, S_PI, S_PI2, S_DECL0, S_DECL,
    S_MDECL0, S_STRING, S_CMTO, S_CMT, S_CMTE0, S_CMTE1, S_DECLCMT0,
    S_DECLCMT, S_DECLCMTE0, S_GROUP, S_PENT, S_ENT0, S_ENT, S_ENTCR,
    S_UTF8,
)

DM_DATA = "DATA"
DM_DTD = "DTD"

# process-lifetime EntityDef singletons for the 5 predefined XML
# entities (built on first XML DTD setup; see setup_dtd)
_XML_ENT_SINGLETONS = None

MS_INCLUDE, MS_IGNORE, MS_CDATA, MS_RCDATA = range(4)
EV_EXPLICIT, EV_OMITTED, EV_SHORTTAG, EV_SHORTREF = range(4)

CR = '\r'
LF = '\n'

import re as _re_mod

# bulk-scan regexes: chars each linear state reacts to
_RE_PCDATA = _re_mod.compile(r'[<&\]\r]')
_RE_PCDATA_U = _re_mod.compile(r'[<&\]\r\x80-\xff]')
_RE_DECL_BANG = _re_mod.compile(r'[>="\'\-\[]')
_RE_DECL_BANG_U = _re_mod.compile(r'[>="\'\-\[\x80-\xff]')
# shorttag: '/' closes ANY declaration with a non-empty buffer —
# including <!...> ones (parser.c:5158-5169 checks CF_ETAGO2 before
# the bang cases), so the bang bulk scan must stop there too
_RE_DECL_BANG_ST = _re_mod.compile(r'[>="\'\-\[/]')
_RE_DECL_BANG_ST_U = _re_mod.compile(r'[>="\'\-\[/\x80-\xff]')
_RE_DECL_TAG = _re_mod.compile(r'[>="\'\[]')
_RE_DECL_TAG_U = _re_mod.compile(r'[>="\'\[\x80-\xff]')
_RE_DECL_TAG_ST = _re_mod.compile(r'[>="\'\[/]')
_RE_DECL_TAG_ST_U = _re_mod.compile(r'[>="\'\[/\x80-\xff]')
_RE_CMT_U = _re_mod.compile(r'[\-\x80-\xff]')
_RE_CDATA = _re_mod.compile(r'[<\r]')
_RE_CDATA_U = _re_mod.compile(r'[<\r\x80-\xff]')
_RE_RCDATA = _re_mod.compile(r'[<&\r]')
_RE_RCDATA_U = _re_mod.compile(r'[<&\r\x80-\xff]')
_RE_MSC = _re_mod.compile(r'[\]\r]')
_RE_MSC_U = _re_mod.compile(r'[\]\r\x80-\xff]')
_RE_PI = _re_mod.compile(r'[?>]')
_RE_PI_U = _re_mod.compile(r'[?>\x80-\xff]')
_BLANK2SPACE = str.maketrans('\t\r\n', '   ')
_BLANKS4 = ' \t\r\n'
_RE_STR_DQ = _re_mod.compile(r'"')
_RE_STR_DQ_U = _re_mod.compile(r'["\x80-\xff]')
_RE_STR_SQ = _re_mod.compile(r"'")
_RE_STR_SQ_U = _re_mod.compile(r"['\x80-\xff]")

# Whole-tag fast path (non-shorttag dialects): a complete begin/end
# tag with quotes balanced — exactly the chars S_DECL would buffer,
# terminated by the first unquoted '>'.  '<' inside a tag falls back
# to the FSM.
# Quoted spans are recognised ONLY after '=' (+ optional blanks):
# S_DECL enters S_STRING solely from the value position (S_VAL0,
# parser.c:5201-5232) — a stray quote elsewhere gripes "Quote inside
# value" and stays in S_DECL, so the tag ends at the FIRST '>'.  An
# unconditional quoted-span alternation used to swallow '>' after
# stray quotes (<a foo"bar>baz">), diverging from the reference's
# tag boundary and dropping the gripe; such tags now fail the match
# and take the per-char path.
_RE_FULLTAG = _re_mod.compile(
    r"<(?:/[A-Za-z][^>\"'<]*"
    r"|[A-Za-z](?:=[ \t\r\n]*\"[^\"<]*\"|=[ \t\r\n]*'[^'<]*'"
    r"|[^>\"'<])*)>")
# whole entity reference incl. terminating ';'
_RE_FULLENT = _re_mod.compile(r"&(#?[A-Za-z0-9._:\-]+);")


def _guard_ok(entry):
    """Guarded tag-memo entry check (6-tuple form): replay is exact
    only while every implicit attr whose creation griped at memo time
    is present on the element — after a DtdCow rollback the attrs are
    gone and the document must re-gripe via the full path."""
    find = entry[1].find_attribute
    for ga in entry[5]:
        if find(ga.name) is None:
            return False
    return True


_MEMO_MISS = object()    # transition-memo probe sentinel (memoized
                         # results legitimately include None)

# steady-state PCDATA executor (see SGMLParser._pcdata_fast): bulk
# span scan that treats ']' as ordinary data (legal because the
# executor only runs with no open marked section)
_RE_PCFAST = _re_mod.compile(r'[<&\r]')
_RE_PCFAST_U = _re_mod.compile(r'[<&\r\x80-\xff]')

# kill switch for A/B benchmarking and differential testing: when
# False, process_chars_toplevel never enters _pcdata_fast and the
# round-2 token-at-a-time branches handle everything
FAST_PCDATA = True

# deeper kill switch: when True, process_chars_toplevel feeds every
# char through putchar with NO bulk branches at all — the exact
# char-at-a-time FSM the reference runs (putchar_dtd_parser).  This
# is the semantic oracle for the bulk collapses themselves: the
# FAST_PCDATA=False arm still uses the whole-tag/entity/span
# collapses, so a collapse bug is invisible to it (the r7
# stray-quote tag-boundary bug hid exactly there).  Test-only; never
# set in production paths.
PURE_FSM = False

# compiled executor (core/_cspeed.c via core/cspeed.py): loaded
# lazily on the first _pcdata_fast call; None = unavailable or
# disabled (SGML_FAST_C=0), in which case the pure-Python executor
# below runs — it is the permanent fallback and differential oracle.
_CSPEED = None
_CSPEED_TRIED = False


def _load_cspeed():
    global _CSPEED, _CSPEED_TRIED
    _CSPEED_TRIED = True
    try:
        from . import cspeed as _cs
        if _cs.MOD is not None:
            _CSPEED = _cs
    except Exception:           # noqa: BLE001 - pure Python fallback
        _CSPEED = None


class StopParse(Exception):
    """Raised internally when max_errors is exceeded
    (sgml2pl.c:2137-2146)."""


class ParserOptions:
    def __init__(self, dialect="sgml", encoding=None, space=None,
                 defaults=True, number="token", max_errors=50,
                 qualify_attributes=False, shorttag=None,
                 case_sensitive_attributes=None,
                 case_preserving_attributes=None,
                 system_entities=False, quiet=False, file=None,
                 keep_prefix=False, positions=False,
                 catalog=None, content_length=None,
                 stop_at=None, max_memory=None,
                 resolver=None, on_urlns=None):
        self.dialect = dialect
        self.qualify_attributes = qualify_attributes
        self.encoding = encoding
        self.space = space
        self.defaults = defaults
        self.number = number
        self.max_errors = max_errors
        self.shorttag = shorttag
        self.case_sensitive_attributes = case_sensitive_attributes
        self.case_preserving_attributes = case_preserving_attributes
        self.system_entities = system_entities
        self.keep_prefix = keep_prefix
        self.positions = positions
        self.catalog = catalog
        self.content_length = content_length
        self.stop_at = stop_at
        self.max_memory = max_memory
        self.quiet = quiet
        self.file = file
        self.resolver = resolver
        self.on_urlns = on_urlns    # url -> canonical ns hook
                                    # (sgml2pl.c:938 put_url)


class Environment:
    """sgml_environment (parser.h:165-180)."""
    __slots__ = ("element", "state", "space_mode", "map", "wants_net",
                 "saved_waiting_for_net", "cdata_memo", "xmlns", "thisns")

    def __init__(self, element):
        self.element = element
        self.state = None
        self.space_mode = D.SP_SGML
        self.map = None
        self.wants_net = False
        self.saved_waiting_for_net = False
        self.cdata_memo = None      # (in_state, out_state) CDATA fast path
        self.xmlns = None           # list of (prefix|None, url) bindings
        self.thisns = None           # (prefix|None, url) default for attrs


# --------------------------------------------------------------------
# shared accretive base DTDs for DTD-less XML (r8)
# --------------------------------------------------------------------
_XML_BASE_DTDS = {}
_XML_BASE_ELEMENT_CAP = 4096    # unique tag names a base may accrete
                                # before it is replaced with a fresh
                                # one (adversarial random-tag corpora
                                # must not pin memory; same bound as
                                # the compiled registries' session cap)


def _get_xml_base_dtd(dialect_name):
    dtd = _XML_BASE_DTDS.get(dialect_name)
    if dtd is None or len(dtd.elements) > _XML_BASE_ELEMENT_CAP or \
            dtd._cow is not None:
        # a live _cow here means a mid-feed() parser owns the current
        # base; handing it out again is fine (the cow-contention path
        # makes a private copy), but a CAP replacement must not yank
        # it out from under the owner — so only replace when unowned
        if dtd is not None and dtd._cow is not None and \
                len(dtd.elements) <= _XML_BASE_ELEMENT_CAP:
            return dtd
        dtd = D.DTD()
        dtd.shared = True
        dtd.accretive = True
        _XML_BASE_DTDS[dialect_name] = dtd
    return dtd


def _xml_base_eligible(opts):
    """Only DTD-neutral option sets may share the accretive base:
    these ParserOptions write DTD fields at parser construction,
    BEFORE the per-parse DtdCow journal opens."""
    enc_ok = opts.encoding is None or opts.encoding.lower().replace(
        "_", "-") in ("utf-8", "utf8", "utf-16", "utf16",
                      "unicode-be", "unicode-le", "utf-16be",
                      "utf-16le", "utf-16-be", "utf-16-le")
    return (enc_ok and opts.space is None and
            opts.number != "integer" and opts.shorttag is None and
            opts.case_sensitive_attributes is None and
            opts.case_preserving_attributes is None and
            not opts.system_entities and not opts.keep_prefix)


class SGMLParser(DeclMixin):

    # _pcdata_fast event-sink specialization: subclasses whose
    # _emit_begin / ev_end are pure no-ops set these True so the
    # steady-state executor can skip the dynamic dispatch entirely,
    # and subclasses whose ev_data unconditionally appends the cdata
    # string to self.text_parts set _FAST_DATA_DIRECT.  Any subclass
    # overriding those hooks MUST leave (or reset) these to False.
    _FAST_BEGIN_NOOP = False
    _FAST_END_NOOP = False
    _FAST_DATA_DIRECT = False

    # compiled-executor tape mode (r5): parsers whose event sinks are
    # pure consumers — they may read startloc/startcdata/charpos and
    # their own attributes, but never feed back into tokenization
    # (no re-entrant parse_content, no live env-stack reads) — let
    # the C executor run the text-only token paths and RECORD the
    # begin/end/data events; _drain_tape then delivers them to the
    # real sinks in order.  DOM building (plain SGMLParser), counting
    # and ESIS sinks qualify; SAX callback parsers (user handlers may
    # re-enter the parser: sax.py parse_content) and early-stop
    # parsers (FirstElementTextParser's StopParse inside ev_end would
    # lose its before-the-stop resume position) must opt out.
    _TAPE_SINKS = True

    # feed() buffer retention: subclasses exposing the synchronous
    # re-entrant parse_content() from push parsing (CallbackParser)
    # set this True; the plain parser keeps push parsing O(1)-memory.
    _retain_feed = False

    # compiled-executor adaptivity: consecutive no-progress C calls;
    # >= 8 disables the C executor for this parser instance (see
    # _pcdata_fast) — class default 0, instance-assigned on use
    _cspeed_noprog = 0

    def __init__(self, options: ParserOptions = None, dtd=None):
        opts = options or ParserOptions()
        self.options = opts
        # error state first: set_dialect may gripe (e.g. redefined
        # entities on a shared DTD)
        self.errors = []
        self.error_count = 0
        self.quiet = opts.quiet
        self.max_errors = opts.max_errors
        self.startloc = (1, 0, 0)
        self._entity_startloc = []
        if dtd is not None:
            self.dtd = dtd
        elif opts.dialect in ("html", "html4", "html5", "xhtml", "xhtml5"):
            # shared cached DTD, like the reference's dtd_cache
            # (sgml.pl:244-271)
            from .htmldtd import get_html_dtd
            self.dtd = get_html_dtd(opts.dialect)
        elif opts.dialect in ("xml", "xmlns") and \
                _xml_base_eligible(opts):
            # shared ACCRETIVE base for DTD-less XML (r8): the
            # reference semantics — undefined elements auto-declared
            # on first use (parser.c:687-705) — produce no events or
            # warnings, so the auto-declarations (and the silent
            # implicit attrs they grow) may persist across documents
            # on one worker.  That keeps the tag/shape memos and the
            # compiled executor's registries warm (a fresh DTD per
            # document cold-started everything, ~13 MB/s
            # single-thread); every OTHER mutation (doctype subsets,
            # entity declarations, encoding switches) still journals
            # through DtdCow and rolls back, so output stays
            # process-history-free (warm-vs-cold differential
            # pytested).
            self.dtd = _get_xml_base_dtd(opts.dialect)
        else:
            self.dtd = D.DTD()
        self.resolver = opts.resolver
        self.base_file = opts.file
        self.set_dialect(opts.dialect)
        # Stream-layer encodings (the SWI set_sgml_parser(P,
        # encoding(...)) matrix): UTF-16 variants are recoded to UTF-8
        # octets before the parser sees them — including BOM-less
        # input with an explicit endianness (parser.c:3807-3849 covers
        # only the parser-level latin-1/ascii/utf-8 set; UTF-16 lives
        # in the reference's Prolog stream layer).
        self._stream_encoding = None
        if opts.encoding is not None:
            enc = opts.encoding.lower().replace("_", "-")
            if enc in ("utf-16", "utf16", "unicode-be", "unicode-le",
                       "utf-16be", "utf-16le", "utf-16-be", "utf-16-le"):
                self._stream_encoding = {
                    "utf-16": "utf-16", "utf16": "utf-16",
                    "unicode-be": "utf-16-be",
                    "unicode-le": "utf-16-le",
                    "utf-16be": "utf-16-be", "utf-16-be": "utf-16-be",
                    "utf-16le": "utf-16-le", "utf-16-le": "utf-16-le",
                }[enc]
                self.xml_set_encoding("utf-8")
            else:
                self.xml_set_encoding(opts.encoding)
        if opts.space is not None:
            self.dtd.space_mode = D.SPACE_MODE_NAMES[opts.space]
        if opts.number == "integer":
            self.dtd.number_mode_integer = True
        if opts.shorttag is not None:
            self.dtd.shorttag = opts.shorttag
        if opts.case_sensitive_attributes is not None:
            self.dtd.att_case_sensitive = opts.case_sensitive_attributes
        if opts.case_preserving_attributes is not None:
            self.dtd.att_case_preserving = opts.case_preserving_attributes
            self.dtd.att_case_sensitive = opts.case_preserving_attributes
        if opts.system_entities:
            self.dtd.system_entities = True
        if opts.keep_prefix:
            self.dtd.keep_prefix = True
        self.max_errors = opts.max_errors
        self.quiet = opts.quiet

        # tokenizer state
        self.state = S_PCDATA
        self.cdata_state = S_PCDATA
        self.buffer = []            # markup buffer (icharbuf)
        self.cdata = []             # output CDATA buffer (ocharbuf)
        self.blank_cdata = True
        self.cdata_must_be_empty = False
        self.mark_state = MS_INCLUDE
        self.marked = []            # marked-section stack of MS_* types
        self.map = None             # active shortref map
        self.environments = []      # Environment stack (top = [-1])
        self.first = False
        self.waiting_for_net = False
        self.etag = None            # end-tag for CDATA/RCDATA content
        self.saved = None
        self.lit_saved_state = S_DECL
        self.grouplevel = 0
        self.event_class = EV_EXPLICIT
        self.dmode = DM_DATA
        self._val0 = False
        self.enforce_outer_element = None

        # location
        self.line = 1
        self.linepos = 0
        self.charpos = 0
        self.startloc = (1, 0, 0)
        self.startcdata = (1, 0, 0)
        self._locstack = []
        self._entity_startloc = []  # file-level startloc while in entities

        # UTF-8 sub-state
        self.utf8_decode = self.dtd.encoding == "utf-8"
        self.utf8_char = 0
        self.utf8_left = 0
        self.utf8_saved_state = S_PCDATA

        # output
        self.errors = []            # ParseError list
        self.error_count = 0
        self.dom = []               # top-level content list
        self._stack = []            # open Element nodes (DOM builder)
        self.stopped = False        # stop-at condition hit
                                    # (sgml2pl SA_* stop conditions)
        self.data_spans = []        # (start,end) charpos per data node
        self.elem_spans = []        # (start,end) charpos per element
                                    # start-tag, in begin-event order

        # re-entrant sub-parse support (sgml2pl.c:1981-2012 recursive
        # sgml_parse + SA_CONTENT): whole-document buffer + base so a
        # begin callback can continue the tokenizer re-entrantly, and
        # a skip count the suspended outer loop consumes on resume
        self._doc_text = None
        self._doc_base = 0
        self._pending_skip = 0
        self._feed_mode = False     # True once feed() retains a buffer
        self._ent_frames = []       # (replacement_text, [index]) stack
                                    # for re-entrant parse inside
                                    # entity expansion (sax.py)
        self._emitting_empty = False  # p->empty_element analog
        self._decl_gripe = False    # tokenizer griped in current
                                    # token (blocks memoization)
        self._rq_gripes = 0         # requires-quotes warnings in the
                                    # current begin tag (shape path
                                    # replays them per occurrence)
        self._url_cache = []        # MRU url->canonical (URL_CACHE=4)
        self._c_tape = []           # compiled-executor event tape
                                    # (drained by _drain_tape)
        self._accreted = None       # element ids auto-declared THIS
                                    # parse on the accretive base:
                                    # a same-document redeclaration
                                    # still gripes like the reference,
                                    # a warm cross-document one must
                                    # not (decls.def_element)
        self._cow_obj = None        # this parse's DtdCow on a shared
                                    # DTD (dtd.py; rollback at end)
        self._ns_drain = None       # region-time xmlns frame stack
                                    # while draining a C tape (r6):
                                    # resolution reads this instead of
                                    # self.environments, which is at
                                    # the region's END state by then
        self._ns_drain_names = None  # per-region element-name
                                    # resolution memo (r7): bindings
                                    # are constant between drain pops
                                    # (in-region begins are binding-
                                    # neutral by the C gate), so
                                    # name -> QName/str resolves once

    # ------------------------------------------------------------------
    # dialect / encoding (parser.c:1256-1298, 3807-3849)
    # ------------------------------------------------------------------

    def set_dialect(self, name):
        dialect = D.DIALECT_NAMES[name]
        dtd = self.dtd
        if dtd.dialect == dialect and dtd._setup_done:
            # no-op like the reference (parser.c:1257 guard); keeps
            # the shared DTD's tag memo warm across documents
            self.utf8_decode = dtd.encoding == "utf-8"
            return
        dtd.dialect = dialect
        dtd._setup_done = True
        # flags changed: cached parsed tags may embed dialect behaviour.
        # xmlns included (r6): entries store UNRESOLVED (e, atts) —
        # binding pushes and name resolution happen live per replay
        # (update_xmlns + _emit_begin), so the memo is dialect-safe
        dtd._tag_memo = {}
        dtd._shape_memo = {}
        dtd._ent_fast = {}
        # the compiled executor's registries derive entries from the
        # memos above and embed the SAME dialect behaviour (e.g. the
        # unquoted-attr-in-XML gripe fires in xml dialects only): a
        # dialect switch on an already-set-up DTD must flush them too
        # (r8: the html5<->xhtml5 shared-DTD switch replayed an
        # html5-era <a href=...> shape in an xhtml5 parse and dropped
        # the xml-only quotes warning — exposed by the tape sweep
        # once the accretive xml base changed rollback cadences)
        dtd._omit_gen[0] += 1
        if dialect in (D.DL_SGML, D.DL_HTML, D.DL_HTML5):
            if dialect == D.DL_HTML5:
                dtd.encoding = "utf-8"
            dtd.case_sensitive = False
            dtd.att_case_sensitive = False
            dtd.space_mode = D.SP_SGML
            dtd.shorttag = dialect == D.DL_SGML
        else:
            dtd.case_sensitive = True
            dtd.att_case_sensitive = True
            dtd.encoding = "utf-8"
            dtd.space_mode = D.SP_PRESERVE
            dtd.shorttag = False
            # the 5 predefined XML entities are declared through the
            # real declaration parser ONCE per process and installed
            # as shared EntityDef singletons afterwards: ET_LITERAL
            # entities are immutable after declaration (only
            # SYSTEM/PUBLIC get e.value resolver writes, and
            # redefinition gripes without mutating), and DTD-less XML
            # creates a fresh DTD per document — 5 full declaration
            # parses per doc was ~20% of the DTD-less corpus profile
            global _XML_ENT_SINGLETONS
            if _XML_ENT_SINGLETONS is None:
                for decl in XML_ENTITY_DECLS:
                    self.process_entity_declaration(decl)
                _XML_ENT_SINGLETONS = {
                    n: dtd.entities[n]
                    for n in ("lt", "gt", "amp", "apos", "quot")}
            else:
                dtd.entities.update(_XML_ENT_SINGLETONS)
        self.utf8_decode = dtd.encoding == "utf-8"

    def xml_set_encoding(self, enc):
        enc = enc.lower()
        if enc in ("iso-8859-1", "us-ascii", "iso_latin_1", "ascii"):
            self.dtd.encoding = "iso-8859-1"
        elif enc in ("utf-8", "utf8"):
            self.dtd.encoding = "utf-8"
        else:
            self.gripe(*Gripes.existence("character encoding", enc))
            return
        self.utf8_decode = self.dtd.encoding == "utf-8"

    # ------------------------------------------------------------------
    # errors
    # ------------------------------------------------------------------

    def gripe(self, severity, message):
        if severity == ERROR:
            self.error_count += 1
        if severity != STYLE and not self.quiet:
            if self._entity_startloc:
                line = self._entity_startloc[0][0]
            else:
                line = self.startloc[0]
            self.errors.append(ParseError(severity, line, message))
        if self.max_errors >= 0 and self.error_count > self.max_errors:
            raise StopParse()
        return False

    # ------------------------------------------------------------------
    # event sinks -> DOM (sgml2pl.c:1192-1446)
    # ------------------------------------------------------------------

    def ev_begin(self, name, attrs):
        node = Element(name, attrs, [])
        if self._stack:
            self._stack[-1].content.append(node)
        else:
            self.dom.append(node)
        self._stack.append(node)

    def ev_end(self, name):
        if self._stack:
            self._stack.pop()
        if not self._stack and self.options.stop_at == "element":
            # parse(element): stop after the first complete element
            # (sgml2pl.c SA_ELEMENT, :1304-1310)
            self.stopped = True

    def ev_data(self, kind, text):
        if kind == "cdata":
            node = text
        elif kind == "sdata":
            node = SData(text)
        else:
            node = NData(text)
        start = self.startcdata[2]
        end = self.startloc[2] if self.startloc[2] > start \
            else self.charpos
        self.data_spans.append((start, end))
        if self._stack:
            self._stack[-1].content.append(node)
        else:
            self.dom.append(node)

    def ev_pi(self, text):
        node = PI(text)
        if self._stack:
            self._stack[-1].content.append(node)
        else:
            self.dom.append(node)

    # ------------------------------------------------------------------
    # location helpers
    # ------------------------------------------------------------------

    def _set_startloc(self, line, lpos):
        self.startloc = (line, lpos, self.charpos - 1)
        # tokenizer-level gripes for the CURRENT token (e.g. the
        # S_DECL unquoted-attribute-in-XML warning) fire before
        # process_begin_element captures its err0 guard; this flag
        # carries them into the memo guard so a griping tag parse is
        # never memoized (r5: replay was silently dropping the
        # warning on repeat parses — found by the tape differential)
        self._decl_gripe = False

    def push_location(self):
        self._locstack.append(
            (self.line, self.linepos, self.charpos, self.startloc))

    def pop_location(self):
        if self._locstack:
            (self.line, self.linepos, self.charpos,
             self.startloc) = self._locstack.pop()

    def push_location_for_subset(self, decl, i):
        self.push_location()
        line, lpos, cpos = self.startloc
        for c in '<' + decl[:i]:
            cpos += 1
            if c == LF:
                line += 1
                lpos = 0
            elif c == CR:
                lpos = 0
            else:
                lpos += 1
        self.line, self.linepos, self.charpos = line, lpos, cpos

    # ------------------------------------------------------------------
    # entry points
    # ------------------------------------------------------------------

    def _begin_dtd_cow(self):
        """Activate per-parse copy-on-write on a shared (cached
        per-dialect) DTD so this parse's tag-soup adaptations and
        internal-subset declarations roll back at parse end — output
        must not depend on what this worker parsed before (the
        reference shares dtd_cache state instead; see dtd.DtdCow)."""
        dtd = self.dtd
        # tag/shape memo entries bake in the registering parser's
        # options.defaults outcome (atts[n_explicit:] and the frozen
        # default pairs in shape entries): a parser with a different
        # defaults setting sharing this DTD must not replay them
        # (ADVICE r6).  The memos are keyed to ONE defaults setting
        # at a time; a mismatch flushes them (and the C registries
        # via OMIT_GEN, which also derive begin entries from them).
        if getattr(dtd, "_memo_defaults", True) != self.options.defaults:
            if dtd._tag_memo is not None:
                dtd._tag_memo = {}
            if dtd._shape_memo is not None:
                dtd._shape_memo = {}
            dtd._omit_gen[0] += 1
            dtd._memo_defaults = self.options.defaults
        if not dtd.shared:
            return
        cow = dtd._cow
        if cow is not None:
            if cow is self._cow_obj:
                return              # continuing an incremental feed()
            owner = cow.owner() if cow.owner is not None else None
            if owner is None or owner is self or owner.stopped:
                # abandoned by a dropped/stopped parser (feed()
                # without close()): restore the pristine DTD before
                # journaling our parse
                dtd._cow = None
                cow.rollback(dtd)
            else:
                # another live parser is mid-feed() on this shared
                # dialect DTD; stealing its journal would revert its
                # adaptations under it mid-parse.  Give this parse a
                # private unshared DTD copy instead.
                if dtd.accretive:
                    # accretive xml base: a fresh plain DTD run
                    # through set_dialect is a complete pristine copy
                    # (elements auto-declare; entity singletons and
                    # flags reinstall).  Deliberately NOT copied from
                    # the shared object — its scalars/entities may
                    # carry the mid-feed owner's journaled state.
                    # Option-level DTD writes can't be lost: base
                    # eligibility (_xml_base_eligible) required them
                    # absent.
                    self.dtd = D.DTD()
                    self.set_dialect(self.options.dialect)
                    self._cow_obj = None
                    return
                from .htmldtd import private_dtd_copy
                priv = private_dtd_copy(dtd)
                if priv is not None:
                    self.dtd = priv
                    self._cow_obj = None
                    return
                # no copy recipe for this shared DTD: legacy steal
                dtd._cow = None
                cow.rollback(dtd)
        self._accreted = set() if dtd.accretive else None
        self._cow_obj = dtd._cow = D.DtdCow(dtd, owner=self)
        # recompute the decode flag from the DTD this parse actually
        # starts on (review r8): a parser CONSTRUCTED while another
        # parser's journaled encoding switch was live on the shared
        # DTD latched that value in set_dialect's no-op branch; by
        # the time this parse begins, the owner's journal has rolled
        # back (or we took a pristine private copy above), so the
        # init-time latch could decode UTF-8 documents as Latin-1.
        # Explicit ParserOptions.encoding is not lost: it was written
        # into dtd.encoding at construction (own DTD) or is utf-8 by
        # base eligibility.
        self.utf8_decode = dtd.encoding == "utf-8"

    def _end_dtd_cow(self):
        cow = self.dtd._cow
        if cow is not None and cow is self._cow_obj:
            self.dtd._cow = None
            cow.rollback(self.dtd)
        self._cow_obj = None

    def feed(self, data):
        """Incremental push-parse (reference push API analog,
        parser.c:4682-4718 begin/putchar/end lifecycle): feed any
        byte chunking; the FSM carries state across chunk
        boundaries.  Call close() at end of input."""
        if self.stopped:
            # a stopped parser ignores further input; without this a
            # retention-mode feed would keep growing _doc_text (and
            # re-griping) after the max_memory stop
            return self
        self._begin_dtd_cow()
        if isinstance(data, (bytes, bytearray)):
            data = bytes(data)
            if self._stream_encoding is not None:
                # incremental UTF-16 recode (same semantics as the
                # whole-buffer path in parse(): bare 'utf-16' is
                # BOM-driven with a big-endian default)
                if not hasattr(self, "_inc_head"):
                    self._inc_head = b""
                    self._inc_dec = None
                if self._inc_dec is None:
                    self._inc_head += data
                    if len(self._inc_head) < 2:
                        return self     # need 2 bytes to sniff a BOM
                    import codecs
                    enc = self._stream_encoding
                    if enc == "utf-16":
                        enc = ("utf-16-le"
                               if self._inc_head[:2] == b"\xff\xfe"
                               else "utf-16-be")
                    self._inc_dec = codecs.getincrementaldecoder(enc)(
                        errors="replace")
                    data, self._inc_head = self._inc_head, b""
                u = self._inc_dec.decode(data)
                if u[:1] == "﻿":
                    u = u[1:]
                data = u.encode("utf-8")
            text = data.decode("latin-1")
        else:
            text = data
        self._fed_tail = getattr(self, "_fed_tail", "")
        # hold back a trailing CR/LF so close() can apply the EOF
        # newline rule exactly once
        text = self._fed_tail + text
        if text.endswith((CR, LF)):
            self._fed_tail = text[-1]
            text = text[:-1]
        else:
            self._fed_tail = ""
        if self._retain_feed:
            # buffer-retention mode (CallbackParser): keep the fed
            # text so the synchronous parse_content() re-entrant API
            # works from push parsing too.  Trades memory for the
            # reference's pull-mode convenience; max_memory bounds it.
            if not self._feed_mode:
                self._feed_mode = True
                self._doc_text = ""
                self._doc_base = self.charpos
            else:
                # drop the consumed prefix so retention is O(unconsumed
                # tail), not O(total stream): parse_content() only ever
                # slices forward from charpos (sax.py:117), so nothing
                # before charpos - _doc_base can be read again
                consumed = self.charpos - self._doc_base
                if 0 < consumed <= len(self._doc_text):
                    self._doc_text = self._doc_text[consumed:]
                    self._doc_base = self.charpos
            self._doc_text += text
            mm = self.options.max_memory
            if mm is not None and len(self._doc_text) > mm:
                try:
                    self.gripe(*Gripes.resource("retained feed buffer"))
                except StopParse:
                    pass
                self.stopped = True
                return self
        else:
            self._doc_text = None   # parse_content: whole-buffer only
        try:
            self.process_chars_toplevel(text)
        except StopParse:
            self.stopped = True
        return self

    def close(self):
        """Finish an incremental parse: EOF newline rule +
        end-of-document processing.  Returns (dom, errors)."""
        tail = getattr(self, "_fed_tail", "")
        try:
            if tail == LF:
                self.process_chars_toplevel(CR)
            elif tail == CR:
                self.process_chars_toplevel(CR)
            elif not self.stopped:
                self.process_chars_toplevel(CR)
            self._fed_tail = ""
            if not self.stopped:
                self.end_document()
        except StopParse:
            pass
        finally:
            self._end_dtd_cow()
        return self.dom, self.errors

    def parse(self, data):
        """Parse a complete document from bytes (or str of octets).
        Returns (dom_content_list, errors)."""
        if isinstance(data, (bytes, bytearray)):
            data = bytes(data)
            if self._stream_encoding is not None:
                # explicit encoding(utf-16 ...) option: recode even
                # without a BOM.  The plain 'utf-16' name is
                # BOM-driven with a big-endian default (network
                # order), matching SWI's BOM-else-default recoding.
                enc = self._stream_encoding
                if enc == "utf-16":
                    if data[:2] == b"\xff\xfe":
                        enc = "utf-16-le"
                    else:
                        enc = "utf-16-be"
                try:
                    u = data.decode(enc, errors="replace")
                    if u[:1] == "\ufeff":
                        u = u[1:]
                    data = u.encode("utf-8")
                except Exception:   # noqa: BLE001 - keep raw octets
                    pass
            # UTF-16 BOM: transcode to UTF-8 octets (the reference's
            # Prolog stream layer does BOM-driven recoding before the
            # parser sees octets)
            elif data[:2] in (b"\xfe\xff", b"\xff\xfe"):
                try:
                    data = data.decode(
                        "utf-16-be" if data[:2] == b"\xfe\xff"
                        else "utf-16-le", errors="replace")[1:] \
                        .encode("utf-8")
                except Exception:   # noqa: BLE001 - keep raw octets
                    pass
            text = data.decode("latin-1")
        else:
            text = data
        if self.options.content_length is not None:
            # content_length(N) option (sgml2pl.c:2174-2183)
            text = text[: self.options.content_length]
        # UTF-8 BOM: the reference's stream layer consumes it before
        # the parser sees octets; mirror that here
        if self.utf8_decode and text.startswith("\xef\xbb\xbf"):
            text = text[3:]
            self.charpos += 3
        # EOF newline handling (sgml2pl.c:2185-2201): a file ending in
        # LF feeds CR instead; a file ending in a normal char feeds an
        # extra CR.  The trailing CR is dropped again at end_document
        # (parser.c:4658-4660) unless a shortref consumes it.
        if text.endswith(LF):
            text = text[:-1] + CR
        elif text and not text.endswith(CR):
            text = text + CR
        self._doc_text = text
        self._doc_base = self.charpos
        self._begin_dtd_cow()
        try:
            self.process_chars_toplevel(text)
            if not self.stopped:
                # a stopped parse skips EOF processing
                # (sgml2pl.c:2216-2221 goto out)
                self.end_document()
        except StopParse:
            pass
        finally:
            self._end_dtd_cow()
        return self.dom, self.errors

    def process_chars_toplevel(self, text):
        """Feed loop with bulk span scanning.

        The reference is strictly char-at-a-time (putchar_dtd_parser);
        we keep per-char semantics but recognise the *linear* states —
        PCDATA runs, tag bodies, comments, strings, CDATA content —
        and consume whole spans up to the next state-relevant char
        with one regex search + one list extend.  Each bulk branch is
        a provably-equivalent collapse of N putchar steps."""
        putchar = self.putchar
        n = len(text)
        i = 0
        max_mem = self.options.max_memory
        check_at = 1 << 16
        if PURE_FSM:
            # reference-exact char-at-a-time oracle (test-only)
            while i < n:
                if self.stopped or self._pending_skip:
                    if self.stopped:
                        return
                    take = self._pending_skip
                    if i + take > n:
                        self._pending_skip = take - (n - i)
                        i = n
                    else:
                        self._pending_skip = 0
                        i += take
                    continue
                if max_mem is not None and len(self.cdata) > check_at:
                    if len(self.cdata) > max_mem:
                        self.gripe(*Gripes.resource("CDATA buffer"))
                        raise StopParse()
                    check_at = len(self.cdata) + (1 << 16)
                putchar(text[i])
                i += 1
            return
        while i < n:
            if self.stopped or self._pending_skip:
                if self.stopped:
                    return
                # a nested parse_content() consumed this span; in
                # feed() mode the sub-parse may have consumed past the
                # current chunk, so carry the overshoot into the next
                # feed's text
                take = self._pending_skip
                if i + take > n:
                    self._pending_skip = take - (n - i)
                    i = n
                else:
                    self._pending_skip = 0
                    i += take
                continue
            if max_mem is not None and len(self.cdata) > check_at:
                # buffer growth guard (ERC_RESOURCE analog,
                # sgml2pl.c:603-615, parser.c:4855-4860)
                if len(self.cdata) > max_mem:
                    self.gripe(*Gripes.resource("CDATA buffer"))
                    raise StopParse()
                check_at = len(self.cdata) + (1 << 16)
            state = self.state
            if state == S_PCDATA:
                if (self.map is None and self.dmode == DM_DATA and
                        not self.waiting_for_net and
                        self.mark_state == MS_INCLUDE and not self.marked):
                    dtd_ = self.dtd
                    # XML dialects ride the executor too (shorttag is
                    # False there and the memo exists; XMLNS is
                    # excluded by its None memo) — the executor calls
                    # update_space_mode per begin tag for them
                    if (FAST_PCDATA and not dtd_.shorttag and
                            dtd_._tag_memo is not None):
                        j = self._pcdata_fast(text, i, n)
                        if j != i:
                            i = j
                            continue
                        # no progress: memo miss / CR / multibyte /
                        # unmatched '<' or '&' — the branches below
                        # (and ultimately putchar) take over at i
                    if text[i] == '<' and not self.dtd.shorttag and \
                            self.dtd.dialect not in D.XML_DIALECTS:
                        # whole-tag collapse of S_DECL0/S_DECL
                        m = _RE_FULLTAG.match(text, i)
                        if m is not None:
                            tag = m.group(0)
                            if not (self.utf8_decode and
                                    not tag.isascii()):
                                self.startloc = (self.line,
                                                 self.linepos + 1,
                                                 self.charpos)
                                if LF in tag:
                                    self._advance_location(tag)
                                else:       # inlined no-newline advance
                                    self.charpos += len(tag)
                                    self.linepos += len(tag)
                                if self.cdata:
                                    self.prepare_cdata()
                                decl = tag[1:-1]
                                # hoisted tag-memo probe (the common
                                # repeated-tag case skips one call)
                                memo = (self.dtd._tag_memo
                                        if self.dmode != DM_DTD else None)
                                entry = (memo.get(decl)
                                         if memo is not None else None)
                                if entry is not None:
                                    self._replay_tag(entry, decl)
                                else:
                                    self.process_declaration(decl)
                                i = m.end()
                                continue
                    if text[i] == '&' and self.dmode == DM_DATA:
                        # whole-entity collapse of S_ENT0/S_ENT + ';'
                        m = _RE_FULLENT.match(text, i)
                        if m is not None:
                            self.startloc = (self.line, self.linepos + 1,
                                             self.charpos)
                            self._advance_location(m.group(0))
                            self.process_entity(m.group(1))
                            i = m.end()
                            continue
                    m = (_RE_PCDATA_U if self.utf8_decode
                         else _RE_PCDATA).search(text, i)
                    j = m.start() if m else n
                    if j > i:
                        i += self._bulk_cdata(text, i, j)
                        continue
            elif state == S_DECL and not self._val0:
                buf = self.buffer
                u = self.utf8_decode
                if buf and buf[0] == '!':
                    if self.dtd.shorttag:
                        rex = (_RE_DECL_BANG_ST_U if u
                               else _RE_DECL_BANG_ST)
                    else:
                        rex = _RE_DECL_BANG_U if u else _RE_DECL_BANG
                elif self.dtd.shorttag:
                    rex = _RE_DECL_TAG_ST_U if u else _RE_DECL_TAG_ST
                else:
                    rex = _RE_DECL_TAG_U if u else _RE_DECL_TAG
                m = rex.search(text, i)
                j = m.start() if m else n
                if j > i:
                    span = text[i:j]
                    buf.extend(span)
                    self._advance_location(span)
                    i = j
                    continue
            elif state in (S_CDATA, S_RCDATA):
                if not self.waiting_for_net:
                    rex = _RE_RCDATA if state == S_RCDATA else _RE_CDATA
                    if self.utf8_decode:
                        rex = (_RE_RCDATA_U if state == S_RCDATA
                               else _RE_CDATA_U)
                    m = rex.search(text, i)
                    j = m.start() if m else n
                    if j > i:
                        span = text[i:j]
                        if self.mark_state != MS_IGNORE:
                            self._bulk_verbatim(span)
                        self._advance_location(span)
                        i = j
                        continue
            elif state == S_CMT:
                # utf8 mode: high bytes go through putchar so the
                # Bad-UTF-8 gripe fires inside comments too (the
                # reference validates the input stream in EVERY
                # state; r7 PURE_FSM finding on <!--\xc3 at EOF)
                if self.utf8_decode:
                    m = _RE_CMT_U.search(text, i)
                    j = m.start() if m else n
                else:
                    j = text.find('-', i)
                    if j < 0:
                        j = n
                if j > i:
                    self._advance_location(text[i:j])
                    i = j
                    continue
            elif state == S_MSCDATA:
                rex = _RE_MSC_U if self.utf8_decode else _RE_MSC
                m = rex.search(text, i)
                j = m.start() if m else n
                if j > i:
                    span = text[i:j]
                    if self.mark_state != MS_IGNORE:
                        self._bulk_verbatim(span)
                    self._advance_location(span)
                    i = j
                    continue
            elif state == S_STRING:
                if self.utf8_decode:
                    rex = (_RE_STR_DQ_U if self.saved == '"'
                           else _RE_STR_SQ_U)
                else:
                    rex = _RE_STR_DQ if self.saved == '"' else _RE_STR_SQ
                m = rex.search(text, i)
                j = m.start() if m else n
                if j > i:
                    span = text[i:j]
                    self.buffer.extend(span)
                    self._advance_location(span)
                    i = j
                    continue
            elif state == S_PI:
                m = (_RE_PI_U if self.utf8_decode else _RE_PI).search(text, i)
                j = m.start() if m else n
                if j > i:
                    span = text[i:j]
                    self.buffer.extend(span)
                    self._advance_location(span)
                    i = j
                    continue
            elif state == S_DECLCMT:
                if self.utf8_decode:
                    m = _RE_CMT_U.search(text, i)
                    j = m.start() if m else n
                else:
                    j = text.find('-', i)
                    if j < 0:
                        j = n
                if j > i:
                    self._advance_location(text[i:j])
                    i = j
                    continue
            putchar(text[i])
            i += 1

    def _drain_tape(self, ns_snap=None):
        """Deliver the events the compiled executor recorded
        (tape mode) to the real event sinks, in document order.

        Each entry carries the positions Python's own executor would
        have exposed at the equivalent sink call, so _emit_begin's
        elem_spans/position attr and ev_data's data_spans come out
        identical (differential-tested in tests/test_cspeed.py).
        startloc/startcdata/charpos are restored afterwards: the C
        writeback already left the parser at the region's end state.

        Entries: ("b", memo_entry, startloc, charpos) — begin, with
        memo_entry = ('b', e, atts, empty, conref); empty=True begins
        (XML self-close — r8: the executor commits them) are followed
        by their own ("e", name) event, so sinks always see balanced
        begin/end pairs; ("e", name) — end;
        ("d", s, startcdata, startloc, charpos).

        ns_snap (xmlns tape regions only): the env-stack xmlns frames
        as of region ENTRY.  _emit_begin's name resolution must see
        region-time bindings, but the env stack is already at the
        region's end state (C popped/pushed it) — so the drain walks a
        replica: pre-region pops shrink it, in-region begins are
        binding-neutral by the C gate (binding-carrying tags bail to
        Python pre-commit), tracked only as a depth counter.
        """
        tape = self._c_tape
        save_sl = self.startloc
        save_scd = self.startcdata
        save_cp = self.charpos
        if ns_snap is not None:
            stack = list(ns_snap)
            indepth = 0
            self._ns_drain = stack
            names = {}
            self._ns_drain_names = names
        try:
            for ev in tape:
                k = ev[0]
                if k == "d":
                    _k, s, scd, sl, cp = ev
                    self.startcdata = scd
                    self.startloc = sl
                    self.charpos = cp
                    self.ev_data("cdata", s)
                elif k == "b":
                    _k, entry, sl, cp = ev
                    self.startloc = sl
                    self.charpos = cp
                    if entry[3]:
                        # empty begin (r8: the executor commits
                        # these; a matching ("e", name) follows) —
                        # set the flag exactly like _replay_tag so a
                        # future tape-capable sink that reads
                        # _emitting_empty (sax.parse_content) stays
                        # correct
                        self._emitting_empty = True
                        self._emit_begin(entry[1], entry[2])
                        self._emitting_empty = False
                    else:
                        self._emit_begin(entry[1], entry[2])
                    if ns_snap is not None:
                        indepth += 1
                else:
                    if ns_snap is not None:
                        if indepth:
                            indepth -= 1
                        elif stack:
                            stack.pop()
                            names.clear()
                    self.ev_end(ev[1])
        finally:
            self._ns_drain = None
            self._ns_drain_names = None
            del tape[:]
            self.startloc = save_sl
            self.startcdata = save_scd
            self.charpos = save_cp

    def _pcdata_fast(self, text, i, n):
        """Steady-state PCDATA token executor.

        A fused, local-variable inline of the round-2 bulk branches
        (whole-tag memo replay, whole-entity collapse, PCDATA span
        append) for the by-far-common parser configuration: no
        shortref map, DATA mode, no marked section, no pending NET,
        non-shorttag non-XML dialect.  It processes tokens in a tight
        loop until anything perturbs that configuration (state change,
        map install, DTD swap, stop condition, memo miss, CR or
        multibyte byte, unmatched '<'/'&') and then returns the new
        position; the general loop re-establishes invariants and takes
        over.  Every branch is a 1:1 inline of the corresponding
        method (_replay_tag / _bulk_cdata / prepare_cdata /
        emit_cdata / process_entity's cached expansions / the
        one-level omitted-close walk of open_element+pop_to); no new
        semantics.

        Locations (line/linepos/charpos) live in locals and are
        written back before every call that can gripe, emit events, or
        raise StopParse (gripe itself reads only startloc).  Tokens
        whose entire effect is inlined ("pure") skip the full
        perturbation recheck: the inline code knows exactly which
        fields it touched.  ']' is ordinary data here (no open marked
        section), so the span regex drops it from the stop set.

        When the compiled executor (core/_cspeed.c) is available it
        takes over for the text-only profile (begin/end noop + direct
        data sink), non-XML non-inex dialects, and unbounded buffers;
        it implements exactly this method's PURE paths and returns to
        this loop at every impure token, so output is byte-identical
        (enforced by tests/test_cspeed.py differential suite;
        SGML_FAST_C=0 disables it).
        """
        if not _CSPEED_TRIED:
            _load_cspeed()
        if (_CSPEED is not None and
                self._cspeed_noprog < 48 and
                self.options.max_memory is None and
                not self.dtd.has_inex and
                (self.dtd.dialect != D.DL_XMLNS or
                 not self.options.qualify_attributes)):
            # xmlns rides C too (r6): binding-carrying tags (xmlns
            # attrs, prefixed names/attrs) are per-entry bailed to
            # Python via cspeed._space_flag -2, so namespace state
            # lives only on Python-pushed environments; drain-time
            # name resolution reads a region-entry snapshot
            # (_ns_drain).  qualify_attributes reads env.thisns live
            # -> Python path.
            # sink mode: no-op begin/end + direct text sink (the
            # text-only profile).  tape mode (r5): any parser whose
            # sinks are pure consumers (_TAPE_SINKS) — C records the
            # events, _drain_tape replays them after the region.
            # stop_at parses are excluded from tape mode: C consumes
            # input past the point where ev_end would stop the
            # tokenizer, which breaks sub-document resume positions.
            sink_mode = (self._FAST_DATA_DIRECT and
                         self._FAST_BEGIN_NOOP and self._FAST_END_NOOP)
            tape_mode = (not sink_mode and self._TAPE_SINKS and
                         self.options.stop_at is None and
                         not self._pending_skip)
        else:
            sink_mode = tape_mode = False
        one_span = False
        if sink_mode or tape_mode:
            # XML dialects: the per-begin update_space_mode outcome is
            # precomputed per memo entry (cspeed._space_flag) and
            # applied C-side; for xmlns the same flag bails
            # binding-carrying tags pre-commit
            ns_snap = None
            if tape_mode and self.dtd.dialect == D.DL_XMLNS:
                # region-entry snapshot of the xmlns frames: C may pop
                # binding-carrying ancestors mid-region, so drain-time
                # resolution cannot read the live env stack
                ns_snap = [env.xmlns for env in self.environments]
            j = _CSPEED.MOD.pcdata_fast(
                _CSPEED.ctx_for(self.dtd), self, text, i, n,
                self.utf8_decode,
                self.dtd.dialect in D.XML_DIALECTS,
                tape_mode)
            if j > i:
                self._cspeed_noprog = 0
                if tape_mode and self._c_tape:
                    self._drain_tape(ns_snap)
                return j
            if j == i:
                # C blocked on the very first token (memo miss,
                # depth-0 push, comment, multi-level close...): let
                # the GENERAL loop handle exactly one token and
                # retry C — NOT the Python executor, which would run
                # the whole following region at Python speed (r4
                # regression: 4x).  But a corpus where C blocks on
                # EVERY token (DTD-less XML: all elements undefined)
                # would thrash C session builds one token at a time
                # (measured 0.4x), so 8 consecutive no-progress
                # calls disable C for this parser instance and the
                # Python executor takes over.
                self._cspeed_noprog += 1
                c0 = text[i]
                if c0 != '<' and c0 != '&' and c0 != '\r':
                    # C blocked on a DATA span that needs the full
                    # open_element path (blank_cdata + no #PCDATA
                    # transition).  The general loop's putchar would
                    # process it char-at-a-time with putchar position
                    # conventions; the pure-Python executor opens at
                    # the SPAN START — so run the executor body below
                    # for exactly ONE span (r5: third position
                    # differential fix), then C retries.  noprog was
                    # counted above: a corpus where every span bails
                    # still disables C.
                    one_span = True
                else:
                    return i
            # j == -1: session not applicable (deep stack, exotic
            # cdata, non-UCS1 text) — run the Python executor below
        dtd = self.dtd
        memo = dtd._tag_memo
        fastent = dtd._ent_fast
        envs = self.environments
        utf8 = self.utf8_decode
        re_pc = _RE_PCFAST_U if utf8 else _RE_PCFAST
        tag_match = _RE_FULLTAG.match
        ent_match = _RE_FULLENT.match
        is_xml = dtd.dialect in D.XML_DIALECTS
        is_xmlns = dtd.dialect == D.DL_XMLNS
        has_inex = dtd.has_inex
        if has_inex and dtd._inex_members is None:
            # force the lazy member set so the per-tag pre-filter is a
            # set probe, not an env-stack walk (CDATA_ELEMENT is never
            # inex-listed, so this probe is free of side effects)
            self._in_or_excluded(M.CDATA_ELEMENT)
        members = dtd._inex_members if has_inex else None
        begin_noop = self._FAST_BEGIN_NOOP
        end_noop = self._FAST_END_NOOP
        sink = self.text_parts if self._FAST_DATA_DIRECT else None
        make_trans = M.make_dtd_transition
        CDATA_EL = M.CDATA_ELEMENT
        ID_CD = id(CDATA_EL)
        C_ANY = M.C_ANY
        SP_STRICT = D.SP_STRICT
        SP_SGML = D.SP_SGML
        SP_DEFAULT = D.SP_DEFAULT
        SP_REMOVE = D.SP_REMOVE
        SP_PRESERVE = D.SP_PRESERVE
        line = self.line
        linepos = self.linepos
        charpos = self.charpos
        cdata = self.cdata
        max_mem = self.options.max_memory
        check_at = len(cdata) + (1 << 16)
        while i < n:
            c = text[i]
            if c == '<':
                m = tag_match(text, i)
                if m is None:
                    break                       # FSM handles '<'
                tag = m.group(0)
                if utf8 and not tag.isascii():
                    break
                entry = memo.get(tag[1:-1])
                if entry is None:
                    break       # miss: general loop redoes this tag
                if len(entry) == 6 and not _guard_ok(entry):
                    break       # guarded entry, attrs rolled back:
                                # general loop re-runs the full path
                # location over the tag (outer-loop tag branch mirror)
                self.startloc = (line, linepos + 1, charpos)
                tl = len(tag)
                charpos += tl
                nl = tag.count(LF)
                if nl:
                    line += nl
                    linepos = tl - tag.rfind(LF) - 1
                else:
                    linepos += tl
                self.line = line
                self.linepos = linepos
                self.charpos = charpos
                pure = True
                # prepare_cdata inline: C_EMPTY auto-close + blank
                # revalidation both divert to the full method (rare)
                if cdata:
                    need_full = False
                    if envs:
                        e0 = envs[-1].element
                        s0 = e0.structure
                        if (s0 is not None and s0.type == M.C_EMPTY and
                                not e0.undefined):
                            need_full = True
                    if not need_full and self.blank_cdata and \
                            not all(map(is_blank_char, cdata)):
                        need_full = True
                    if need_full:
                        self.prepare_cdata()
                        cdata = self.cdata
                        pure = False
                # _replay_tag inline
                if entry[0] == 'b':
                    e, atts, empty_el, conref = entry[1:5]
                    done = False
                    switched = False
                    nmap = None
                    if envs:
                        env = envs[-1]
                        pe = env.element
                        pedef = pe.structure
                        inex_normal = (
                            not has_inex or id(e) not in members or
                            self._in_or_excluded(e) == "normal")
                        if (not pe.undefined and pedef is not None and
                                pedef.type != C_ANY and inex_normal):
                            st = env.state
                            memo_t = st.memo if st is not None else None
                            if memo_t is not None:
                                new = memo_t.get(id(e), _MEMO_MISS)
                                if new is _MEMO_MISS:
                                    new = make_trans(st, e)
                            else:
                                new = make_trans(st, e)
                            penv = env
                            if new is None and len(envs) >= 2 and \
                                    pedef.omit_close and \
                                    not M.find_omitted_path(
                                        st, e, dtd._omit_gen):
                                # one-level omitted-close walk
                                # (open_element idx=top-1 + pop_to
                                # single iteration, parser.c:2962-2996
                                # + 2818-2848 mirrors)
                                env1 = envs[-2]
                                st1 = env1.state
                                memo1 = (st1.memo if st1 is not None
                                         else None)
                                if memo1 is not None:
                                    new1 = memo1.get(id(e), _MEMO_MISS)
                                    if new1 is _MEMO_MISS:
                                        new1 = make_trans(st1, e)
                                else:
                                    new1 = make_trans(st1, e)
                                if new1 is not None:
                                    env1.state = new1
                                    # pop_to inline: validate, emit,
                                    # ev_end, pop (omit_close known
                                    # True -> no omitted-close gripe)
                                    if (not pe.undefined and
                                            pedef.type != C_ANY and
                                            pedef.final_state
                                            is not None):
                                        fs = pedef.final_state
                                        est = env.state
                                        if est is None:
                                            ok1 = False
                                        elif fs is est:
                                            ok1 = True
                                        else:
                                            smm = est.same_memo
                                            r = (smm.get(id(fs),
                                                         _MEMO_MISS)
                                                 if smm is not None
                                                 else _MEMO_MISS)
                                            if r is _MEMO_MISS:
                                                r = M.same_state(fs, est)
                                            ok1 = r
                                        if not ok1:
                                            self.gripe(*Gripes.validate(
                                                "Incomplete element: "
                                                "<%s>" % pe.name))
                                    if cdata:
                                        # emit_cdata(last=True) inline
                                        s = ''.join(cdata)
                                        sm = env.space_mode
                                        if sm == SP_SGML or \
                                                sm == SP_DEFAULT:
                                            if self.first:
                                                if s and s[0] == CR:
                                                    s = s[1:]
                                                if s and s[0] == LF:
                                                    s = s[1:]
                                            if s:
                                                if s[-1] == LF:
                                                    s = s[:-1]
                                                if s and s[-1] == CR:
                                                    s = s[:-1]
                                            if sm == SP_DEFAULT:
                                                s = collapse_blanks(s)
                                        elif sm == SP_REMOVE:
                                            s = collapse_blanks(
                                                s, trim=True)
                                        if s:
                                            if not self.blank_cdata:
                                                if (self.
                                                        cdata_must_be_empty):
                                                    self.gripe(
                                                        *Gripes.
                                                        not_allowed_pcdata(
                                                            s))
                                                if sink is not None:
                                                    sink.append(s)
                                                else:
                                                    self.ev_data(
                                                        "cdata", s)
                                                    pure = False
                                            else:
                                                bnew = make_trans(
                                                    env.state, CDATA_EL)
                                                if bnew is not None:
                                                    env.state = bnew
                                                    if sink is not None:
                                                        sink.append(s)
                                                    else:
                                                        self.ev_data(
                                                            "cdata", s)
                                                        pure = False
                                                elif (env.element.
                                                      undefined and
                                                      env.space_mode in
                                                      (SP_PRESERVE,
                                                       SP_STRICT)):
                                                    if sink is not None:
                                                        sink.append(s)
                                                    else:
                                                        self.ev_data(
                                                            "cdata", s)
                                                        pure = False
                                        cdata = self.cdata = []
                                        self.blank_cdata = True
                                        self.cdata_must_be_empty = False
                                    self.first = False
                                    if not end_noop:
                                        self.ev_end(pe.name)
                                        pure = False
                                    envs.pop()
                                    self.map = env1.map
                                    penv = env1
                                    new = new1
                            if new is not None:
                                env = penv
                                env.state = new
                                if cdata:
                                    # emit_cdata(last=False) inline
                                    s = ''.join(cdata)
                                    sm = env.space_mode
                                    if sm == SP_SGML or sm == SP_DEFAULT:
                                        if self.first:
                                            if s and s[0] == CR:
                                                s = s[1:]
                                            if s and s[0] == LF:
                                                s = s[1:]
                                        if sm == SP_DEFAULT:
                                            s = collapse_blanks(s)
                                    elif sm == SP_REMOVE:
                                        s = collapse_blanks(s, trim=True)
                                    if s:
                                        if not self.blank_cdata:
                                            if self.cdata_must_be_empty:
                                                self.gripe(
                                                    *Gripes.
                                                    not_allowed_pcdata(s))
                                            if sink is not None:
                                                sink.append(s)
                                            else:
                                                self.ev_data("cdata", s)
                                                pure = False
                                        else:
                                            bnew = make_trans(
                                                env.state, CDATA_EL)
                                            if bnew is not None:
                                                env.state = bnew
                                                if sink is not None:
                                                    sink.append(s)
                                                else:
                                                    self.ev_data(
                                                        "cdata", s)
                                                    pure = False
                                            elif (env.element.undefined
                                                  and env.space_mode in
                                                  (SP_PRESERVE,
                                                   SP_STRICT)):
                                                if sink is not None:
                                                    sink.append(s)
                                                else:
                                                    self.ev_data(
                                                        "cdata", s)
                                                    pure = False
                                    cdata = self.cdata = []
                                    self.blank_cdata = True
                                    self.cdata_must_be_empty = False
                                nenv = Environment(e)
                                nedef = e.structure
                                nenv.state = (
                                    nedef.initial_state
                                    if nedef is not None and
                                    nedef.initial_state is not None
                                    else M.make_state_engine(e))
                                nenv.space_mode = env.space_mode
                                if e.map is not None:
                                    nmap = e.map
                                else:
                                    nmap = env.map
                                self.map = nenv.map = nmap
                                envs.append(nenv)
                                self.first = True
                                if nedef is not None:
                                    t = nedef.type
                                    if t == M.C_CDATA or t == M.C_RCDATA:
                                        self.state = (S_CDATA
                                                      if t == M.C_CDATA
                                                      else S_RCDATA)
                                        self.cdata_state = self.state
                                        self.etag = e.name
                                        self.startcdata = (line, linepos,
                                                           charpos)
                                        switched = True
                                    else:
                                        self.cdata_state = S_PCDATA
                                done = True
                        elif pe.undefined and pedef is not None and \
                                inex_normal:
                            # undefined-parent push — open_element's
                            # allow_for branch (parser.c:2851-2890):
                            # no transition walk, no gripes.  This is
                            # the steady state of DTD-less xml/xmlns
                            # documents (every element undefined);
                            # without it each begin left the tight
                            # loop through the full open_element
                            # path.  push_element keeps the flush,
                            # map and CDATA-switch semantics.
                            self.allow_for(pe, e)
                            if cdata:
                                pure = False
                            self.push_element(e, False)
                            cdata = self.cdata
                            if self.state != S_PCDATA:
                                switched = True
                            done = True
                    if not done:
                        self.open_element(e, True)
                        cdata = self.cdata
                        pure = False
                    if is_xml:
                        # xml:space / element space-mode handling
                        # (_replay_tag mirror for XML dialects); only
                        # mutates env.space_mode or gripes
                        if is_xmlns:
                            self.update_xmlns(e, atts)
                        self.update_space_mode(e, atts)
                    if not begin_noop or is_xmlns:
                        # xmlns: even for noop-begin profiles the
                        # _emit_begin resolution must run — it can
                        # gripe (undefined prefix) and define
                        # implicit bindings, which the full path does
                        self._emitting_empty = bool(empty_el)
                        self._emit_begin(e, atts)
                        self._emitting_empty = False
                        pure = False
                    if empty_el:
                        self.close_element(e, conref)
                        if conref:
                            self.cdata_state = self.state = S_PCDATA
                        cdata = self.cdata
                        pure = False
                    i = m.end()
                    if pure:
                        if switched or nmap is not None:
                            return i
                        continue
                else:
                    e = entry[1]
                    if cdata:
                        # emit_cdata(last=True) inline
                        s = ''.join(cdata)
                        if envs:
                            env = envs[-1]
                            sm = env.space_mode
                            if sm == SP_SGML or sm == SP_DEFAULT:
                                if self.first:
                                    if s and s[0] == CR:
                                        s = s[1:]
                                    if s and s[0] == LF:
                                        s = s[1:]
                                if s:
                                    if s[-1] == LF:
                                        s = s[:-1]
                                    if s and s[-1] == CR:
                                        s = s[:-1]
                                if sm == SP_DEFAULT:
                                    s = collapse_blanks(s)
                            elif sm == SP_REMOVE:
                                s = collapse_blanks(s, trim=True)
                        if s:
                            if not self.blank_cdata:
                                if self.cdata_must_be_empty:
                                    self.gripe(
                                        *Gripes.not_allowed_pcdata(s))
                                if sink is not None:
                                    sink.append(s)
                                else:
                                    self.ev_data("cdata", s)
                                    pure = False
                            elif envs:
                                env = envs[-1]
                                bnew = make_trans(env.state, CDATA_EL)
                                if bnew is not None:
                                    env.state = bnew
                                    if sink is not None:
                                        sink.append(s)
                                    else:
                                        self.ev_data("cdata", s)
                                        pure = False
                                elif (env.element.undefined and
                                      env.space_mode in
                                      (SP_PRESERVE, SP_STRICT)):
                                    if sink is not None:
                                        sink.append(s)
                                    else:
                                        self.ev_data("cdata", s)
                                        pure = False
                        cdata = self.cdata = []
                        self.blank_cdata = True
                        self.cdata_must_be_empty = False
                    if envs and envs[-1].element is e:
                        env = envs[-1]
                        edef = e.structure
                        ok = True
                        if (edef is not None and not e.undefined and
                                edef.type != C_ANY and
                                edef.final_state is not None):
                            fs = edef.final_state
                            est = env.state
                            if est is None:
                                ok = False
                            elif fs is not est:
                                smm = est.same_memo
                                r = (smm.get(id(fs), _MEMO_MISS)
                                     if smm is not None else _MEMO_MISS)
                                if r is _MEMO_MISS:
                                    r = M.same_state(fs, est)
                                ok = r
                        if not ok:
                            self.gripe(*Gripes.validate(
                                "Incomplete element: <%s>" % e.name))
                        self.first = False
                        if not end_noop:
                            self.ev_end(e.name)
                            pure = False
                        envs.pop()
                        mp = envs[-1].map if envs else None
                        self.map = mp
                        i = m.end()
                        if pure:
                            if mp is not None:
                                return i
                            continue
                    else:
                        self.close_element(e, False)
                        cdata = self.cdata
                        pure = False
                        i = m.end()
                # impure token: full perturbation recheck (mirrors the
                # general loop's steady-state guard + preconditions)
                if (self.state != S_PCDATA or self.map is not None or
                        self.stopped or self._pending_skip or
                        self.dtd is not dtd or self.dmode != DM_DATA or
                        self.mark_state != MS_INCLUDE or self.marked or
                        self.waiting_for_net or
                        self.utf8_decode != utf8):
                    return i
                line = self.line
                linepos = self.linepos
                charpos = self.charpos
                cdata = self.cdata
                continue
            if c == '&':
                m = ent_match(text, i)
                if m is None:
                    break                       # FSM handles '&'
                ename = m.group(1)
                self.startloc = (line, linepos + 1, charpos)
                ml = m.end() - i                # entity spans no LF
                charpos += ml
                linepos += ml
                fe = fastent.get(ename) if fastent is not None else None
                if fe is not None:
                    # process_entity single-outcome replay (the cache
                    # is populated only by the plain-append / one-char
                    # / EC_CDATA-text paths and invalidated on any
                    # declaration)
                    s_, kind = fe
                    if kind == 0:
                        cdata.append(s_)        # numeric: plain append
                    elif s_:
                        if self.blank_cdata and (
                                kind == 2 or not is_blank_char(s_)):
                            env = envs[-1] if envs else None
                            handled = False
                            if env is not None:
                                cm = env.cdata_memo
                                if cm is not None and cm[0] is env.state:
                                    env.state = cm[1]
                                    self.cdata_must_be_empty = False
                                    handled = True
                            if not handled:
                                self.line = line
                                self.linepos = linepos
                                self.charpos = charpos
                                self.cdata_must_be_empty = \
                                    not self.open_element(CDATA_EL, False)
                                cdata = self.cdata
                                self.blank_cdata = False
                                i = m.end()
                                if (self.state != S_PCDATA or
                                        self.map is not None or
                                        self.stopped or
                                        self._pending_skip or
                                        self.dtd is not dtd or
                                        self.dmode != DM_DATA or
                                        self.mark_state != MS_INCLUDE or
                                        self.marked or
                                        self.waiting_for_net or
                                        self.utf8_decode != utf8):
                                    if kind == 1:
                                        cdata.append(s_)
                                    else:
                                        cdata.extend(s_)
                                    return i
                            self.blank_cdata = False
                        if kind == 1:
                            cdata.append(s_)
                        else:
                            cdata.extend(s_)
                    i = m.end()
                    # buffer-growth guard (entity "width bombs": tags
                    # flush cdata, entity replays only grow it)
                    if max_mem is not None and len(cdata) > check_at:
                        if len(cdata) > max_mem:
                            self.line = line
                            self.linepos = linepos
                            self.charpos = charpos
                            self.gripe(*Gripes.resource("CDATA buffer"))
                            raise StopParse()
                        check_at = len(cdata) + (1 << 16)
                    continue
                self.line = line
                self.linepos = linepos
                self.charpos = charpos
                self.process_entity(ename)
                i = m.end()
                if (self.state != S_PCDATA or self.map is not None or
                        self.stopped or self._pending_skip or
                        self.dtd is not dtd or self.dmode != DM_DATA or
                        self.mark_state != MS_INCLUDE or self.marked or
                        self.waiting_for_net or
                        self.utf8_decode != utf8):
                    return i
                line = self.line
                linepos = self.linepos
                charpos = self.charpos
                cdata = self.cdata
                if max_mem is not None and len(cdata) > check_at:
                    if len(cdata) > max_mem:
                        self.gripe(*Gripes.resource("CDATA buffer"))
                        raise StopParse()
                    check_at = len(cdata) + (1 << 16)
                continue
            m = re_pc.search(text, i)
            j = m.start() if m else n
            if j == i:
                break                           # CR / multibyte: FSM
            span = text[i:j]
            ns = j - i
            if self.blank_cdata:
                # _bulk_cdata blank-prefix inline; the common span
                # starts non-blank (k == 0), skipping the lstrip copy
                c0 = span[0]
                if (c0 == ' ' or c0 == '\t' or c0 == '\n' or
                        (ord(c0) > 255 and c0.isspace())):
                    k = ns - len(span.lstrip(_BLANKS4))
                    while k < ns and ord(span[k]) > 255 and \
                            span[k].isspace():
                        k += 1
                        while k < ns and is_blank_char(span[k]):
                            k += 1
                else:
                    k = 0
                if k:
                    if not cdata:
                        self.startcdata = (line, linepos + 1, charpos)
                    elif (span[0] == LF and cdata[-1] == CR and envs and
                            envs[-1].space_mode != SP_STRICT):
                        cdata.pop()
                    cdata.extend(span[:k])
                if k < ns:
                    env = envs[-1] if envs else None
                    handled = False
                    if env is not None:
                        cm = env.cdata_memo
                        if cm is not None and cm[0] is env.state:
                            env.state = cm[1]
                            self.cdata_must_be_empty = False
                            handled = True
                        else:
                            pe = env.element
                            pedef = pe.structure
                            if (not pe.undefined and pedef is not None
                                    and pedef.type != C_ANY):
                                st2 = env.state
                                bm = st2.memo if st2 is not None else None
                                if bm is not None:
                                    new = bm.get(ID_CD, _MEMO_MISS)
                                    if new is _MEMO_MISS:
                                        new = make_trans(st2, CDATA_EL)
                                else:
                                    new = make_trans(st2, CDATA_EL)
                                if new is not None:
                                    env.cdata_memo = (st2, new)
                                    env.state = new
                                    self.cdata_must_be_empty = False
                                    handled = True
                    opened = False
                    if not handled:
                        self.line = line
                        self.linepos = linepos
                        self.charpos = charpos
                        self.cdata_must_be_empty = not self.open_element(
                            CDATA_EL, False)
                        cdata = self.cdata
                        opened = True
                    self.blank_cdata = False
                    if self.map is not None:
                        # shortref map installed: prefix is consumed,
                        # the rest re-runs per-char (mirror of
                        # _bulk_cdata's early return k)
                        pre = span[:k]
                        pnl = pre.count(LF)
                        charpos += k
                        if pnl:
                            line += pnl
                            linepos = k - pre.rfind(LF) - 1
                        else:
                            linepos += k
                        self.line = line
                        self.linepos = linepos
                        self.charpos = charpos
                        return i + k
                    rest = span[k:]
                    if not cdata:
                        self.startcdata = (line, linepos + 1, charpos)
                    elif (rest[0] == LF and cdata[-1] == CR and envs and
                            envs[-1].space_mode != SP_STRICT):
                        cdata.pop()
                    cdata.extend(rest)
                    if opened and (self.stopped or self._pending_skip):
                        # implied-tag events may have tripped a stop
                        # condition: finish this span (byte-exact with
                        # _bulk_cdata) then yield at the token boundary
                        charpos += ns
                        nl = span.count(LF)
                        if nl:
                            line += nl
                            linepos = ns - span.rfind(LF) - 1
                        else:
                            linepos += ns
                        self.line = line
                        self.linepos = linepos
                        self.charpos = charpos
                        return j
            else:
                if not cdata:
                    self.startcdata = (line, linepos + 1, charpos)
                elif (span[0] == LF and cdata[-1] == CR and envs and
                        envs[-1].space_mode != SP_STRICT):
                    cdata.pop()
                cdata.extend(span)
            charpos += ns
            nl = span.count(LF)
            if nl:
                line += nl
                linepos = ns - span.rfind(LF) - 1
            else:
                linepos += ns
            if max_mem is not None and len(cdata) > check_at:
                if len(cdata) > max_mem:
                    self.line = line
                    self.linepos = linepos
                    self.charpos = charpos
                    self.gripe(*Gripes.resource("CDATA buffer"))
                    raise StopParse()
                check_at = len(cdata) + (1 << 16)
            i = j
            if one_span:
                break       # C-bail single-span mode: hand back so
                            # the compiled executor retries at i
        self.line = line
        self.linepos = linepos
        self.charpos = charpos
        return i

    def _bulk_verbatim(self, span):
        """N x add_verbatim_cdata for a span with no CR and no
        specials (parser.c:4801-4818 collapsed).

        The CR+LF boundary fold runs FIRST: a span-leading LF after a
        buffered CR pops the CR exactly like the per-char path — also
        when blank_cdata is still set (the blank-prefix branch used to
        skip it, so <style>\\r\\nx</style> kept the CR; r7 PURE_FSM
        differential finding).

        POSITION CONVENTION: an implied open triggered by the first
        non-blank char of a blank-prefixed span runs with the
        location at SPAN START — the canonical convention shared by
        the compiled executor's tape and the steady-state executor
        (r5 position rules).  Character data and error output are
        identical to per-char execution; only the node-row span
        metadata of such implied opens reflects span granularity
        (PURE_FSM stamps the trigger char instead; the FSM
        differential masks row positions for this reason)."""
        cdata = self.cdata
        if span[0] == LF and cdata and cdata[-1] == CR:
            cdata.pop()
        if self.blank_cdata:
            k = 0
            ns = len(span)
            while k < ns and is_blank_char(span[k]):
                k += 1
            if k < ns:
                cdata.extend(span[:k])
                self.cdata_must_be_empty = not self.open_element(
                    M.CDATA_ELEMENT, False)
                self.blank_cdata = False
                self.cdata.extend(span[k:])
            else:
                cdata.extend(span)
            return
        cdata.extend(span)

    def _bulk_cdata(self, text, i, j):
        """Append text[i:j] to cdata with add_cdata semantics
        (parser.c:4758-4797) in bulk.  The span contains no CR, no
        specials, no multibyte leads; newline normalisation therefore
        reduces to identity (no CR present) and shortref matching is
        off (map is None)."""
        span = text[i:j]
        if self.blank_cdata:
            n = len(span)
            k = n - len(span.lstrip(_BLANKS4))
            while k < n and ord(span[k]) > 255 and span[k].isspace():
                k += 1
                while k < n and is_blank_char(span[k]):
                    k += 1
            if k:
                self._append_span(span[:k])
            if k < n:
                # open_element may imply open tags, which flush the
                # pending (blank) cdata first -- order matters.  It may
                # also install a shortref map, in which case the rest
                # of the span must go through the per-char path.
                # (inlined #PCDATA transition from open_element: the
                # per-State memo makes this a dict hit; CDATA_ELEMENT
                # can never be in an inclusion/exclusion list)
                envs = self.environments
                env = envs[-1] if envs else None
                handled = False
                if env is not None:
                    memo = env.cdata_memo
                    if memo is not None and memo[0] is env.state:
                        env.state = memo[1]
                        self.cdata_must_be_empty = False
                        handled = True
                    else:
                        pe = env.element
                        pedef = pe.structure
                        if (not pe.undefined and pedef is not None and
                                pedef.type != M.C_ANY):
                            new = M.make_dtd_transition(
                                env.state, M.CDATA_ELEMENT)
                            if new is not None:
                                env.cdata_memo = (env.state, new)
                                env.state = new
                                self.cdata_must_be_empty = False
                                handled = True
                if not handled:
                    self.cdata_must_be_empty = not self.open_element(
                        M.CDATA_ELEMENT, False)
                self.blank_cdata = False
                if self.map is not None:
                    self._advance_location(span[:k])
                    return k
                self._append_span(span[k:])
        else:
            # inlined _append_span + no-LF _advance_location (the
            # span has no CR and bulk spans rarely carry LF)
            cdata = self.cdata
            if not cdata:
                self.startcdata = (self.line, self.linepos + 1,
                                   self.charpos)
            elif (span[0] == LF and cdata[-1] == CR and
                    self.environments and
                    self.environments[-1].space_mode != D.SP_STRICT):
                cdata.pop()
            cdata.extend(span)
        self._advance_location(span)
        return len(span)

    def _append_span(self, span):
        cdata = self.cdata
        if not cdata:
            self.startcdata = (self.line, self.linepos + 1, self.charpos)
        # add_cdata fold: a span-leading LF after a buffered CR folds
        # the CR away (parser.c:4769-4796)
        if (span[0] == LF and cdata and cdata[-1] == CR and
                self.environments and
                self.environments[-1].space_mode != D.SP_STRICT):
            cdata.pop()
        cdata.extend(span)

    def _advance_location(self, span):
        nl = span.count(LF)
        self.charpos += len(span)
        if nl:
            self.line += nl
            self.linepos = len(span) - span.rfind(LF) - 1
        else:
            self.linepos += len(span)

    # ------------------------------------------------------------------
    # the FSM (parser.c:4847-5349)
    # ------------------------------------------------------------------

    def putchar(self, chr_):
        dtd = self.dtd
        line = self.line
        lpos = self.linepos
        self.charpos += 1

        if self.state == S_UTF8:
            cp = ord(chr_)
            if (cp & 0xC0) != 0x80:     # TBD: recover (parser.c:4864)
                self.gripe(*Gripes.syntax_error("Bad UTF-8 sequence", ""))
            self.utf8_char = (self.utf8_char << 6) | (cp & 0x3F)
            self.utf8_left -= 1
            if self.utf8_left == 0:
                chr_ = safe_chr(self.utf8_char)
                self.state = self.utf8_saved_state
            else:
                return
        elif self.utf8_decode and 0xC0 <= ord(chr_) <= 0xFD:
            cp = ord(chr_)
            bytes_ = 1
            mask = 0x20
            while cp & mask:
                bytes_ += 1
                mask >>= 1
            self.utf8_saved_state = self.state
            self.state = S_UTF8
            self.utf8_char = cp & (mask * 2 - 1)
            self.utf8_left = bytes_
            self.line = line
            self.linepos = lpos + 1
            return

        if chr_ == LF:
            self.line = line + 1
            self.linepos = 0
        elif chr_ == CR:
            self.linepos = 0
        else:
            self.linepos = lpos + 1

        while True:  # `goto reprocess` loop
            state = self.state
            if state == S_PCDATA:
                if chr_ == '<':
                    self._set_startloc(line, lpos)
                    self.state = S_DECL0
                    self.buffer = []
                    return
                if self.dmode == DM_DTD:
                    if chr_ == '%':
                        self._set_startloc(line, lpos)
                        self.state = S_PENT
                        self.buffer = []
                        return
                else:
                    if chr_ == '&':
                        self._set_startloc(line, lpos)
                        self.state = S_ENT0
                        return
                if self.marked and chr_ == ']':
                    self.buffer = []
                    self.state = S_EMSC1
                    self.saved = chr_
                    return
                if self.waiting_for_net and chr_ == '/':
                    self.waiting_for_net = False
                    self._set_startloc(line, lpos)
                    self.process_net()
                    return
                if not self.cdata:
                    # pre-char rule, same as the executors' span path
                    # (start_pos = position OF the run's first char;
                    # the old post-increment value made a run started
                    # here begin one char late — r5, found by the
                    # tape-mode differential)
                    self.startcdata = (line, lpos + 1, self.charpos - 1)
                if (self.blank_cdata and self.mark_state == MS_INCLUDE
                        and not is_blank_char(chr_)):
                    # run the #PCDATA open with pre-char positions,
                    # mirroring the executors' span path: implied-tag
                    # events (and their elem_spans / position attrs)
                    # see the position OF the triggering char, not
                    # one past it (r5, same differential)
                    pl, pp, pc = self.line, self.linepos, self.charpos
                    self.line, self.linepos, self.charpos = \
                        line, lpos, pc - 1
                    try:
                        self.cdata_must_be_empty = not self.open_element(
                            M.CDATA_ELEMENT, False)
                    finally:
                        self.line, self.linepos, self.charpos = pl, pp, pc
                    self.blank_cdata = False
                    if not self.cdata:
                        # implied tags flushed the blank buffer: this
                        # char starts a fresh run (executor 'rest'
                        # rule, parser.py span path)
                        self.startcdata = (line, lpos + 1,
                                           self.charpos - 1)
                self.add_cdata(chr_)
                return

            if state == S_ECDATA2:      # seen </ in CDATA/RCDATA
                if (chr_ == '>' and len(self.buffer) == len(self.etag) and
                        ''.join(self.buffer).lower() == self.etag.lower()):
                    del self.cdata[len(self.cdata) - len(self.etag) - 2:]
                    if self.mark_state == MS_INCLUDE:
                        self.process_cdata(last=True)
                        self.process_end_element(''.join(self.buffer))
                        self.empty_cdata()
                    self.buffer = []
                    self.cdata_state = self.state = S_PCDATA
                else:
                    self.add_verbatim_cdata(chr_)
                    if (len(self.etag) < len(self.buffer) + 1 or
                            not is_name_char(chr_)):
                        self.buffer = []
                        self.state = self.cdata_state
                    else:
                        self.buffer.append(chr_)
                return

            if state == S_ECDATA1:      # seen < in CDATA
                self.add_verbatim_cdata(chr_)
                if chr_ == '/':
                    self.buffer = []
                    self.state = S_ECDATA2
                elif chr_ != '<':
                    self.state = self.cdata_state
                return

            if state == S_RCDATA:
                if chr_ == '&':
                    self._set_startloc(line, lpos)
                    self.state = S_ENT0
                    return
                state = S_CDATA         # fallthrough

            if state == S_CDATA:
                self.add_verbatim_cdata(chr_)
                if chr_ == '<':
                    self._set_startloc(line, lpos)
                    self.state = S_ECDATA1
                if self.waiting_for_net and chr_ == '/':
                    self._set_startloc(line, lpos)
                    self.cdata.pop()
                    if self.mark_state == MS_INCLUDE:
                        self.process_cdata(last=True)
                        self.process_net()
                        self.empty_cdata()
                    self.buffer = []
                    self.cdata_state = self.state = S_PCDATA
                return

            if state == S_MSCDATA:
                self.add_verbatim_cdata(chr_)
                if chr_ == ']':
                    self.state = S_EMSCDATA1
                return

            if state == S_EMSCDATA1:
                self.add_verbatim_cdata(chr_)
                self.state = S_EMSCDATA2 if chr_ == ']' else S_MSCDATA
                return

            if state == S_EMSCDATA2:
                self.add_verbatim_cdata(chr_)
                if chr_ == '>':         # ]]>
                    del self.cdata[-3:]
                    self.pop_marked_section()
                    self.state = S_PCDATA
                elif chr_ != ']':       # ]]] stays
                    self.state = S_MSCDATA
                return

            if state == S_EMSC1:
                if chr_ == ']':
                    self.state = S_EMSC2
                else:
                    self.buffer.append(chr_)
                    self.recover_parser()
                return

            if state == S_EMSC2:
                if chr_ == '>':
                    self.pop_marked_section()
                    self.state = S_PCDATA
                else:
                    self.buffer.append(chr_)
                    self.recover_parser()
                return

            if state == S_PENT:         # %parameter entity;
                if chr_ == ';':
                    self.state = S_PCDATA
                    if self.mark_state == MS_INCLUDE:
                        self.process_include(''.join(self.buffer))
                    self.buffer = []
                    return
                if is_name_char(chr_):
                    self.buffer.append(chr_)
                    return
                self.gripe(*Gripes.syntax_error(
                    "Illegal parameter entity", ''.join(self.buffer)))
                return

            if state == S_ENT0:         # seen &
                if chr_ == '#' or is_name_char(chr_):
                    self.buffer = [chr_]
                    self.state = S_ENT
                    return
                if self.dtd.dialect in D.XML_DIALECTS:
                    self.gripe(*Gripes.syntax_error(
                        "Illegal entity", '&' + chr_))
                self.add_cdata('&')
                self.state = self.cdata_state
                continue                # reprocess

            if state == S_ENT:
                if is_name_char(chr_):
                    self.buffer.append(chr_)
                    return
                name = ''.join(self.buffer)
                self.state = self.cdata_state
                if self.mark_state == MS_INCLUDE:
                    self.process_entity(name)
                self.buffer = []
                if chr_ == CR:
                    self.state = S_ENTCR
                    return
                if chr_ == ';' or chr_ == LF:
                    return
                continue                # reprocess

            if state == S_ENTCR:        # seen &entCR: eat the LF
                self.state = self.cdata_state
                if chr_ != LF:
                    continue
                return

            if state == S_DECL0:        # seen <
                if chr_ == '/':
                    self.buffer.append(chr_)
                    self.state = S_DECL
                elif is_name_char(chr_):
                    self.buffer.append(chr_)
                    self.state = S_DECL
                elif chr_ == '!':
                    self.state = S_MDECL0
                elif chr_ == '?':
                    self.state = S_PI
                    self.buffer = []
                else:                   # recover
                    self.add_cdata('<')
                    self.add_cdata(chr_)
                    self.state = S_PCDATA
                return

            if state == S_MDECL0:       # seen <!
                if chr_ == '-':
                    self.state = S_CMTO
                    return
                self.buffer.append('!')
                self.buffer.append(chr_)
                self.state = S_DECL
                return

            if state == S_DECL:
                r = self._s_decl(chr_)
                if r == "reprocess":
                    continue
                return

            if state == S_DECLCMT0:     # <...-
                if chr_ == '-':
                    self.buffer.pop()
                    self.state = S_DECLCMT
                else:
                    self.buffer.append(chr_)
                    self.state = S_DECL
                return

            if state == S_DECLCMT:
                if chr_ == '-':
                    self.state = S_DECLCMTE0
                return

            if state == S_DECLCMTE0:
                self.state = S_DECL if chr_ == '-' else S_DECLCMT
                return

            if state == S_PI:
                self.buffer.append(chr_)
                if chr_ == '?':
                    self.state = S_PI2
                if chr_ == '>':         # no ? is ok too
                    self._finish_pi()
                return

            if state == S_PI2:
                if chr_ == '>':
                    self._finish_pi()
                    return
                self.buffer.append(chr_)
                self.state = S_PI
                return

            if state == S_STRING:
                self.buffer.append(chr_)
                if chr_ == self.saved:
                    self.state = self.lit_saved_state
                return

            if state == S_CMTO:         # seen <!-
                if chr_ == '-':
                    self.state = S_CMT
                else:
                    self.add_cdata('<')
                    self.add_cdata('!')
                    self.add_cdata('-')
                    self.add_cdata(chr_)
                    self.state = S_PCDATA
                return

            if state == S_CMT:
                if chr_ == '-':
                    self.state = S_CMTE0
                return

            if state == S_CMTE0:
                self.state = S_CMTE1 if chr_ == '-' else S_CMT
                return

            if state == S_CMTE1:        # seen <!--...--
                if chr_ == '>':
                    self.state = S_PCDATA
                else:
                    if self.dtd.dialect in D.XML_DIALECTS:
                        self.gripe(*Gripes.syntax_error("Illegal comment", ""))
                    if chr_ != '-':
                        self.state = S_CMT
                return

            if state == S_GROUP:        # [...] in declaration
                self.buffer.append(chr_)
                if chr_ == '[':
                    self.grouplevel += 1
                elif chr_ == ']':
                    self.grouplevel -= 1
                    if self.grouplevel == 0:
                        self.state = S_DECL
                elif chr_ in ('"', "'"):
                    self.state = S_STRING
                    self.saved = chr_
                    self.lit_saved_state = S_GROUP
                return

            raise AssertionError("bad state %r" % state)

    def _s_decl(self, chr_):
        """S_DECL + S_VAL0 handling (parser.c:5142-5232).  S_VAL0 is
        folded in via self._val0 flag."""
        dtd = self.dtd
        if getattr(self, "_val0", False):
            self._val0 = False
            if chr_ in ('"', "'"):
                self.buffer.append(chr_)
                self.state = S_STRING
                self.saved = chr_
                self.lit_saved_state = S_DECL
                return None
            if is_blank_char(chr_):
                self.buffer.append(chr_)
                self._val0 = True
                return None
            if dtd.dialect in D.XML_DIALECTS:
                self._decl_gripe = True     # block memoization: the
                                            # gripe precedes err0
                self.gripe(*Gripes.syntax_warning(
                    "Unquoted attribute in XML is not allowed",
                    ''.join(self.buffer)))
            # fall through into normal S_DECL handling of chr_

        if chr_ == '>':
            self.prepare_cdata()
            self.state = S_PCDATA
            if self.mark_state == MS_INCLUDE:
                self.process_declaration(''.join(self.buffer))
            self.buffer = []
            return None
        if dtd.shorttag and chr_ == '/' and self.buffer:
            self.prepare_cdata()
            self.state = S_PCDATA
            if self.mark_state == MS_INCLUDE:
                old = self.event_class
                self.event_class = EV_SHORTTAG
                try:
                    self.process_declaration(''.join(self.buffer))
                finally:
                    self.event_class = old
            self.buffer = []
            self.waiting_for_net = True
            return None

        self.buffer.append(chr_)

        if chr_ == '=' and self.buffer[0] != '!':
            self._val0 = True
        elif chr_ == '"':
            if self.buffer[0] != '!':
                self.gripe(*Gripes.syntax_warning(
                    "Quote inside value", ''.join(self.buffer)))
            else:
                self.state = S_STRING
                self.saved = chr_
                self.lit_saved_state = S_DECL
        elif chr_ == "'":
            if self.buffer[0] != '!':
                self.gripe(*Gripes.syntax_warning(
                    "Quote inside value", ''.join(self.buffer)))
            else:
                self.state = S_STRING
                self.saved = chr_
                self.lit_saved_state = S_DECL
        elif chr_ == '-' and self.buffer[0] == '!':
            self.state = S_DECLCMT0
        elif chr_ == '[':
            self.process_marked_section()
        return None

    def _finish_pi(self):
        self.process_cdata(last=False)
        self.state = S_PCDATA
        self.buffer.pop()               # the > (or ?) terminator
        if self.mark_state == MS_INCLUDE:
            self.process_pi(''.join(self.buffer))
        self.buffer = []

    # ------------------------------------------------------------------
    # CDATA accumulation (parser.c:4758-4846)
    # ------------------------------------------------------------------

    def add_cdata(self, chr_):
        if self.mark_state != MS_INCLUDE:
            return
        buf = self.cdata
        if self.blank_cdata and not is_blank_char(chr_):
            self.cdata_must_be_empty = not self.open_element(
                M.CDATA_ELEMENT, False)
            self.blank_cdata = False
            buf = self.cdata
        strictish = (self.environments and
                     self.environments[-1].space_mode != D.SP_STRICT)
        if chr_ == LF and strictish:
            if not buf or buf[-1] != CR:    # insert missing CR
                self.add_cdata(CR)
                buf = self.cdata
        buf.append(chr_)
        if (self.map is not None and self.map.ends and
                chr_ in self.map.ends and self.match_shortref()):
            return
        if chr_ == LF and strictish:
            if len(buf) > 1 and buf[-1] == LF and buf[-2] == CR:
                buf[-2] = LF
                buf.pop()

    def add_verbatim_cdata(self, chr_):
        if self.mark_state == MS_IGNORE:
            return
        buf = self.cdata
        if self.blank_cdata and not is_blank_char(chr_):
            self.cdata_must_be_empty = not self.open_element(
                M.CDATA_ELEMENT, False)
            self.blank_cdata = False
            buf = self.cdata
        if chr_ == LF and buf and buf[-1] == CR:
            buf.pop()
        buf.append(chr_)

    def empty_cdata(self):
        if self.dmode == DM_DATA:
            self.cdata = []
            self.blank_cdata = True
            self.cdata_must_be_empty = False

    def recover_parser(self):
        """Illegal markup -> reprocess as CDATA (parser.c:4824-4833)."""
        self.add_cdata(self.saved)
        for c in self.buffer:
            self.add_cdata(c)
        self.state = S_PCDATA

    # ------------------------------------------------------------------
    # CDATA emission with space modes (parser.c:4249-4470)
    # ------------------------------------------------------------------

    def emit_cdata(self, last):
        if not self.cdata:
            return True
        s = ''.join(self.cdata)
        if self.environments:
            sm = self.environments[-1].space_mode
            if sm in (D.SP_SGML, D.SP_DEFAULT):
                if self.first:
                    if s and s[0] == CR:
                        s = s[1:]
                    if s and s[0] == LF:
                        s = s[1:]
                if last and s:
                    if s[-1] == LF:
                        s = s[:-1]
                    if s and s[-1] == CR:
                        s = s[:-1]
                if sm == D.SP_DEFAULT:
                    s = collapse_blanks(s)
            elif sm == D.SP_REMOVE:
                s = collapse_blanks(s, trim=True)
            # SP_PRESERVE / SP_STRICT: verbatim
        if not s:
            self.empty_cdata()
            return True
        if not self.blank_cdata:
            if self.cdata_must_be_empty:
                self.gripe(*Gripes.not_allowed_pcdata(s))
            self.ev_data("cdata", s)
        elif self.environments:
            env = self.environments[-1]
            new = M.make_dtd_transition(env.state, M.CDATA_ELEMENT)
            if new is not None:
                env.state = new
                self.ev_data("cdata", s)
            elif env.element.undefined and env.space_mode in (
                    D.SP_PRESERVE, D.SP_STRICT):
                self.ev_data("cdata", s)
        self.empty_cdata()
        return True

    def prepare_cdata(self):
        """(parser.c:4428-4465)."""
        if not self.cdata:
            return
        if self.mark_state == MS_INCLUDE:
            if self.environments:
                e = self.environments[-1].element
                if (e.structure is not None and
                        e.structure.type == M.C_EMPTY and not e.undefined):
                    self.close_element(e, False)
            if self.blank_cdata:
                blank = all(is_blank_char(c) for c in self.cdata)
                self.blank_cdata = blank
                if not blank:
                    if self.dmode == DM_DTD:
                        self.gripe(*Gripes.syntax_error(
                            "CDATA in DTD", ''.join(self.cdata)))
                    else:
                        self.open_element(M.CDATA_ELEMENT, True)

    def process_cdata(self, last):
        self.prepare_cdata()
        return self.emit_cdata(last)

    # ------------------------------------------------------------------
    # shortref matching (parser.c:1890-1971)
    # ------------------------------------------------------------------

    def match_shortref(self):
        for frm, to in self.map.maps:
            ln = self._match_map(frm)
            if ln:
                del self.cdata[len(self.cdata) - ln:]
                if self.cdata_must_be_empty:
                    self.blank_cdata = all(
                        c.isspace() for c in self.cdata)
                old = self.event_class
                self.event_class = EV_SHORTREF
                try:
                    self.process_entity(to)
                finally:
                    self.event_class = old
                return True
        return False

    def _match_map(self, frm):
        """Suffix match of pattern chars against cdata
        (parser.c:1890-1923).  Returns matched length or 0."""
        data = self.cdata
        e = len(data) - 1
        m = len(frm) - 1
        while m >= 0:
            if e < 0:
                return 0
            pc = frm[m]
            if e >= 0 and pc == data[e]:
                m -= 1
                e -= 1
                continue
            if pc == D.CHR_DBLANK:
                if e > 0 and data[e] in (' ', '\t'):
                    e -= 1
                else:
                    return 0
                while e > 0 and data[e] in (' ', '\t'):
                    e -= 1
                m -= 1
                continue
            if pc == D.CHR_BLANK:
                while e > 0 and data[e] in (' ', '\t'):
                    e -= 1
                m -= 1
                continue
            return 0
        return len(data) - 1 - e

    # ------------------------------------------------------------------
    # marked sections (parser.c:4131-4197)
    # ------------------------------------------------------------------

    def process_marked_section(self):
        buf = ''.join(self.buffer)
        i = 0
        ok = False
        if buf.startswith('!['):
            expanded = self.expand_pentities(buf[2:])
            if expanded is not None:
                r = self.itake_name(expanded, 0)
                if r is not None:
                    kwd, j = r
                    if j < len(expanded) and expanded[j] == '[':
                        kwd_u = kwd.upper()
                        if kwd_u == "IGNORE":
                            mtype = MS_IGNORE
                        elif kwd_u in ("INCLUDE", "TEMP"):
                            mtype = MS_INCLUDE
                        elif kwd_u == "CDATA":
                            mtype = MS_CDATA
                        elif kwd_u == "RCDATA":
                            mtype = MS_RCDATA
                        else:
                            mtype = MS_INCLUDE
                        self.marked.append(mtype)
                        self.buffer = []
                        self.state = S_MSCDATA if mtype == MS_CDATA \
                            else S_PCDATA
                        if self.mark_state != MS_IGNORE:
                            self.mark_state = mtype
                        ok = True
        if not ok:
            if buf.startswith('!') and not buf.startswith('!['):
                self.state = S_GROUP
                self.grouplevel = 1

    def pop_marked_section(self):
        if self.marked:
            self.marked.pop()
            self.mark_state = self.marked[-1] if self.marked else MS_INCLUDE

    # ------------------------------------------------------------------
    # declaration dispatch (parser.c:3941-3988)
    # ------------------------------------------------------------------

    def process_declaration(self, decl):
        if self.dmode != DM_DTD:
            memo = self.dtd._tag_memo
            if memo is not None:
                entry = memo.get(decl)
                if entry is not None:
                    return self._replay_tag(entry, decl)
            if decl.startswith('/'):
                return self.process_end_element(decl[1:], memo_key=decl)
            if decl and is_name_char(decl[0]):
                return self.process_begin_element(decl, memo_key=decl)
        if decl.startswith('!'):
            s = decl[1:]
            for kw, fn in (
                    ("entity", self.process_entity_declaration),
                    ("element", self.process_element_declaration),
                    ("attlist", self.process_attlist_declaration),
                    ("notation", self.process_notation_declaration),
                    ("shortref", self.process_shortref_declaration),
                    ("usemap", self.process_usemap_declaration)):
                r = self.isee_identifier(s, 0, kw)
                if r is not None:
                    return fn(s[r:])
            r = self.isee_identifier(s, 0, "sgml")
            if r is not None:
                return self.gripe(*Gripes.syntax_warning(
                    "Ignored <!SGML ...> declaration", ""))
            r = self.isee_identifier(s, 0, "doctype")
            if r is not None:
                if self.dmode != DM_DTD:
                    return self.process_doctype(decl, r + 1)
                return None
            j = self.iskip_layout(s, 0)
            if j < len(s):
                return self.gripe(*Gripes.syntax_error(
                    "Invalid declaration", s[j:]))
            return None
        return self.gripe(*Gripes.syntax_error("Invalid declaration", decl))

    # ------------------------------------------------------------------
    # begin / end element (parser.c:3499-3641)
    # ------------------------------------------------------------------

    def _replay_tag(self, entry, decl=None):
        """Replay a memoized gripe-free tag parse (same event
        sequence as the full path; attr values are doc-independent
        so sharing the parsed list is exact).  `decl` is the raw tag
        body, needed only when a guarded entry (6-tuple) fails its
        attr-presence check and the full path must re-run."""
        if entry[0] == 'b':
            e, atts, empty_el, conref = entry[1:5]
            if len(entry) == 6 and not _guard_ok(entry):
                # guarded entry (see process_begin_element): valid
                # only while every griped implicit attr exists on the
                # element; otherwise re-run the full path so this
                # document gets its own cold-state gripe + append
                return self.process_begin_element(decl, None)
            # steady-state specialization of open_element: parent
            # defined, no inclusion/exclusion hit, content model has a
            # direct transition at the top environment -- exactly the
            # push branch of open_element (no pop_to, no cdata_memo,
            # no gripes).  Anything else falls back to the full path.
            envs = self.environments
            done = False
            if envs:
                env = envs[-1]
                pe = env.element
                pedef = pe.structure
                dtd = self.dtd
                # inlined _in_or_excluded membership pre-filter; the
                # env-stack walk only runs for inex-listed elements
                members = dtd._inex_members if dtd.has_inex else None
                inex_normal = (
                    not dtd.has_inex or
                    (members is not None and id(e) not in members) or
                    self._in_or_excluded(e) == "normal")
                if (not pe.undefined and pedef is not None and
                        pedef.type != M.C_ANY and inex_normal):
                    # inlined make_dtd_transition memo probe (the
                    # dict caches None results, hence the sentinel)
                    st = env.state
                    memo_t = st.memo if st is not None else None
                    if memo_t is not None:
                        new = memo_t.get(id(e), _MEMO_MISS)
                        if new is _MEMO_MISS:
                            new = M.make_dtd_transition(st, e)
                    else:
                        new = M.make_dtd_transition(st, e)
                    if new is not None:
                        env.state = new
                        if self.dtd.shorttag:
                            self.push_element(e, False)
                        else:
                            # inlined push_element (non-shorttag)
                            if self.cdata:
                                self.emit_cdata(last=False)
                            nenv = Environment(e)
                            nedef = e.structure
                            nenv.state = (
                                nedef.initial_state
                                if nedef is not None and
                                nedef.initial_state is not None
                                else M.make_state_engine(e))
                            nenv.space_mode = env.space_mode
                            if e.map is not None:
                                self.map = nenv.map = e.map
                            else:
                                self.map = nenv.map = env.map
                            envs.append(nenv)
                            self.first = True
                            if nedef is not None:
                                t = nedef.type
                                if t == M.C_CDATA or t == M.C_RCDATA:
                                    self.state = (S_CDATA
                                                  if t == M.C_CDATA
                                                  else S_RCDATA)
                                    self.cdata_state = self.state
                                    self.etag = e.name
                                    self.startcdata = (self.line,
                                                       self.linepos,
                                                       self.charpos)
                                else:
                                    self.cdata_state = S_PCDATA
                        done = True
            if not done:
                self.open_element(e, True)
            if self.dtd.dialect in D.XML_DIALECTS:
                if self.dtd.dialect == D.DL_XMLNS:
                    self.update_xmlns(e, atts)
                self.update_space_mode(e, atts)
            self._emitting_empty = bool(empty_el)
            self._emit_begin(e, atts)
            self._emitting_empty = False
            if empty_el:
                self.close_element(e, conref)
                if conref:
                    self.cdata_state = self.state = S_PCDATA
            return True
        e = entry[1]
        if self.cdata:
            self.emit_cdata(last=True)
        # steady-state specialization of close_element: the closed
        # element IS the top environment (no omitted-close unwinding)
        envs = self.environments
        if envs and envs[-1].element is e:
            env = envs[-1]
            # inlined validate_completeness/complete
            edef = e.structure
            if (edef is not None and not e.undefined and
                    edef.type != M.C_ANY and
                    edef.final_state is not None and
                    not (env.state is not None and
                         M.same_state(edef.final_state, env.state))):
                self.gripe(*Gripes.validate(
                    "Incomplete element: <%s>" % e.name))
            self.first = False
            self.ev_end(e.name)
            envs.pop()
            self.map = envs[-1].map if envs else None
            return True
        return self.close_element(e, False)

    def process_begin_element(self, decl, memo_key=None):
        dtd = self.dtd
        err0 = (self.error_count, len(self.errors))
        self._rq_gripes = 0     # "Attribute value requires quotes"
                                # fired during THIS tag's attr parse:
                                # the one warning the shape path can
                                # replay per occurrence (the C scanner
                                # re-derives it from the value chars)
        r = self.itake_name(decl, 0)
        if r is None:
            return self.gripe(*Gripes.syntax_error(
                "Bad open-element tag", decl))
        name, i = r
        e = dtd.find_element(name)
        if e.structure is None:
            if dtd._cow is not None and not dtd.accretive:
                # journaled flip: no flush needed (rollback restores
                # the element; undefined begin tags never memoize —
                # see dtd.DtdCow / dtd.def_element)
                dtd._cow.structure(e)
            else:
                # undefined flip on a private DTD — or the shared
                # ACCRETIVE DTD-less base, where the auto-declaration
                # is event-free and PERSISTS (r8; reference
                # parser.c:687-705 declares on first use): flush THIS
                # DTD's compiled-executor element flags (once per
                # element name ever, so warm docs pay nothing;
                # per-DTD so interleaved DTD-less XML docs don't
                # cold-start the shared dialect DTDs' registries)
                dtd._omit_gen[0] += 1
                if self._accreted is not None:
                    self._accreted.add(id(e))
            e.structure = D.ElementDef()
            e.structure.type = M.C_EMPTY
            e.undefined = True
        self.open_element(e, True)

        atts = []
        r2 = self.process_attributes(e, decl, i, atts)
        if r2 is not None:
            i = r2
        empty = conref = False
        if dtd.dialect in D.XML_DIALECTS:
            if i < len(decl) and decl[i] == '/':
                empty = True
                i += 1
            if dtd.dialect == D.DL_XMLNS:
                self.update_xmlns(e, atts)
            self.update_space_mode(e, atts)
        else:
            if i < len(decl) and decl[i] == '/':
                if dtd.dialect not in D.HTML_DIALECTS:
                    self.gripe(*Gripes.syntax_warning(
                        "Empty tag (<../>) in SGML mode", decl[i:]))
                empty = True
                i += 1
            for a, _v in atts:
                if a.def_ == D.AT_CONREF:
                    empty = conref = True
        if i < len(decl):
            self.gripe(*Gripes.syntax_error("Bad attribute list", decl[i:]))
        n_explicit = len(atts)
        if self.options.defaults:
            self.add_default_attributes(e, atts)
        if empty or (dtd.dialect == D.DL_SGML and e.structure is not None and
                     e.structure.type == M.C_EMPTY and not e.undefined):
            empty_element = e
        else:
            empty_element = None
        memo = dtd._tag_memo
        if (memo_key is not None and memo is not None and
                err0 == (self.error_count, len(self.errors)) and
                not self._decl_gripe and
                not (e.undefined and dtd._cow is not None and
                     not dtd.accretive) and
                len(memo) < 8192):
            # undefined elements don't memoize on SHARED DTDs only: a
            # replay would skip the undefined flip (falling back to
            # open_element, never to process_begin_element), which
            # matters once the DtdCow rollback resets the element
            # between documents — and skipping lets flip-only
            # documents keep every warm cache.  On private per-parse
            # DTDs (DTD-less xml/xmlns) the flip is permanent for the
            # memo's lifetime, so those tags memoize as before.
            cow = dtd._cow
            guards = None
            if cow is not None and cow.attr_objs:
                # attrs whose implicit creation griped this parse:
                # replaying this entry in a document where the attr
                # has not (yet) been re-created would suppress that
                # document's cold-state gripe.  Store them as a guard:
                # _replay_tag falls back to the full path unless every
                # guard attr is present on the element (the compiled
                # executor skips guarded entries via a size gate).
                guards = tuple(a for a, _v in atts
                               if id(a) in cow.attr_objs)
            if guards:
                memo[memo_key] = ('b', e, atts,
                                  empty_element is not None, conref,
                                  guards)
            else:
                memo[memo_key] = ('b', e, atts,
                                  empty_element is not None, conref)
        shape = dtd._shape_memo
        # the ONE per-occurrence warning the C shape path replays is
        # "Attribute value requires quotes" (unquoted non-name-token
        # values — real-crawl <a href=/path>): the C scanner
        # re-derives it from the value chars per occurrence, so an
        # occurrence that griped ONLY that way may still register the
        # (value-independent) shape.  Everything else keeps the
        # strict err0 gate.
        rq_appended = 0 if self.quiet else self._rq_gripes
        shape_err_ok = (
            self.error_count == err0[0] and
            len(self.errors) == err0[1] + rq_appended and
            (self._rq_gripes == 0 or
             dtd.dialect not in D.XML_DIALECTS))
        if (shape is not None and memo_key is not None and
                n_explicit and empty_element is None and not conref and
                shape_err_ok and
                not self._decl_gripe and
                not (e.undefined and dtd._cow is not None and
                     not dtd.accretive) and
                (dtd.dialect != D.DL_XMLNS or
                 (':' not in e.name and
                  not any(a.name == "xmlns" or ':' in a.name
                          for a, _v in atts[:n_explicit]))) and
                len(shape) < 4096):
            # VALUE-INDEPENDENT shape entry: tags whose attr values
            # are unique per occurrence (real <a href=...>) never hit
            # the string-keyed memo, so the compiled executor replays
            # them by (name, attr-name...) shape and parses the
            # values itself.  Eligible only when every explicit attr
            # is a DECLARED CDATA attr (verbatim values; stable
            # across DtdCow rollbacks) and none is xml:space (the
            # space flag is then the element's own mode).
            ok = True
            shape_guards = ()
            for a, _v in atts[:n_explicit]:
                # AT_CURRENT is stateful (explicit occurrences update
                # the carried value); AT_CONREF implies empty.
                if (a.type != D.AT_CDATA or
                        a.def_ in (D.AT_CONREF, D.AT_CURRENT) or
                        a.name == "xml:space"):
                    ok = False
                    break
                # Implicit attrs on SHARED DTDs are rolled back
                # between documents, so their cold-state no_attribute
                # gripe must re-fire once per document.  The shape
                # carries their names as GUARDS: the C executor
                # replays only while find_attribute(name) succeeds
                # (i.e. some earlier tag in THIS document already
                # took the full path, griped, and created the attr —
                # exactly the string-memo 6-tuple guard semantics,
                # _guard_ok).  The gripe-exempt wildcard families
                # (html5 data-*/aria-*) stay unguarded: their replay
                # is value-equivalent even when the rolled-back Attr
                # object is gone.  On a private per-parse DTD
                # implicit attrs live as long as the shape memo.
                if (a.implicit and dtd.shared and
                        not (dtd.accretive and e.undefined) and
                        not (dtd.dialect in D.HTML5_DIALECTS and
                             a.name.startswith(("data-", "aria-")))):
                    # (accretive undefined elements keep their silent
                    # implicit attrs across docs — no gripe to
                    # re-fire, so no guard needed)
                    shape_guards = shape_guards + (a.name,)
            if ok:
                for a, _v in atts[n_explicit:]:
                    # frozen default pairs are exact only for static
                    # defaults (AT_CURRENT reads carried doc state)
                    if a.def_ not in (D.AT_DEFAULT, D.AT_FIXED):
                        ok = False
                        break
            if ok:
                key = e.name + "\0" + "\0".join(
                    a.name for a, _v in atts[:n_explicit])
                if key not in shape:
                    sflag = (e.space_mode
                             if e.space_mode != D.SP_INHERIT else -1)
                    shape[key] = (
                        e,
                        tuple(a for a, _v in atts[:n_explicit]),
                        tuple(atts[n_explicit:]),
                        sflag,
                        shape_guards)
        self._emitting_empty = empty_element is not None
        self._emit_begin(e, atts)
        self._emitting_empty = False
        if empty_element is not None:
            self.close_element(e, conref)
            if conref:
                self.cdata_state = self.state = S_PCDATA
        return True

    def process_end_element(self, decl, memo_key=None):
        self.emit_cdata(last=True)
        r = self.itake_name(decl, 0)
        if r is not None and r[1] >= len(decl):
            e = self.dtd.find_element(r[0])
            memo = self.dtd._tag_memo
            if memo_key is not None and memo is not None and \
                    len(memo) < 8192:
                memo[memo_key] = ('e', e)
            return self.close_element(e, False)
        if self.dtd.shorttag and decl == '':
            return self.close_current_element()
        return self.gripe(*Gripes.syntax_error(
            "Bad close-element tag", decl))

    def _emit_begin(self, e, atts):
        """Begin-element event with XMLNS name resolution
        (sgml2pl.c:986-1041 put_element_name/put_attribute_name) and
        optional position attr (put_tag_position, sgml2pl.c:1134-1149:
        position=file:Start-End over the start-tag char span)."""
        if self.dtd.dialect == D.DL_XMLNS:
            name = self._xmlns_resolve_element(e.name)
            conv = ([(self._xmlns_resolve_attr(
                         k, self.options.qualify_attributes), v)
                     for k, v in self.convert_attributes(atts)]
                    if atts else [])
        else:
            name = e.name
            conv = self.convert_attributes(atts) if atts else []
        if self.options.positions and self.base_file:
            conv = conv + [("position", "%s:%d-%d" % (
                self.base_file, self.startloc[2], self.charpos))]
        self.elem_spans.append((self.startloc[2], self.charpos))
        self.ev_begin(name, conv)

    def update_space_mode(self, e, atts):
        """(parser.c:4218-4240)."""
        for a, v in atts:
            if (a.name == "xml:space" and a.type == D.AT_CDATA and
                    isinstance(v, str)):
                m = D.SPACE_MODE_NAMES.get(v)
                if m is not None:
                    self.environments[-1].space_mode = m
                else:
                    self.gripe(*Gripes.existence("xml:space-mode", v))
                return
        if e.space_mode != D.SP_INHERIT:
            self.environments[-1].space_mode = e.space_mode

    # ------------------------------------------------------------------
    # element stack (parser.c:2741-3063)
    # ------------------------------------------------------------------

    def push_element(self, e, callback):
        """(parser.c:2741-2798)."""
        if e is M.CDATA_ELEMENT:
            return None
        if self.cdata:
            self.emit_cdata(last=False)
        env = Environment(e)
        edef = e.structure
        # inlined make_state_engine memo read (lazy init on miss)
        env.state = (edef.initial_state
                     if edef is not None and edef.initial_state is not None
                     else M.make_state_engine(e))
        env.space_mode = (self.environments[-1].space_mode
                          if self.environments else self.dtd.space_mode)
        if self.dtd.shorttag:
            env.saved_waiting_for_net = self.waiting_for_net
            if self.event_class == EV_SHORTTAG:
                self.waiting_for_net = True
                env.wants_net = True
            else:
                env.wants_net = False
                if e.structure is not None and not e.structure.omit_close:
                    self.waiting_for_net = False
        if e.map is not None:
            self.map = env.map = e.map
        elif self.environments:
            self.map = env.map = self.environments[-1].map
        self.environments.append(env)
        self.first = True
        if callback:
            atts = []
            if self.options.defaults:
                self.add_default_attributes(e, atts)
            self._emit_begin(e, atts)
        if e.structure is not None:
            if e.structure.type in (M.C_CDATA, M.C_RCDATA):
                self.state = (S_CDATA if e.structure.type == M.C_CDATA
                              else S_RCDATA)
                self.cdata_state = self.state
                self.etag = e.name
                self.startcdata = (self.line, self.linepos, self.charpos)
            else:
                self.cdata_state = S_PCDATA
        return env

    def pop_to(self, to_index, e0):
        """Close environments above to_index (parser.c:2818-2848).
        to_index is the index of the environment to keep."""
        while len(self.environments) - 1 > to_index:
            env = self.environments[-1]
            e = env.element
            self.validate_completeness(env)
            if e.structure is not None and not e.structure.omit_close:
                self.gripe(*Gripes.omitted_close(e.name))
            if e0 is not M.CDATA_ELEMENT:
                self.emit_cdata(last=True)
            self.first = False
            if self.dtd.shorttag:
                self.waiting_for_net = env.saved_waiting_for_net
            self.ev_end(e.name)
            self.environments.pop()
        self.map = self.environments[to_index].map

    def complete(self, env):
        e = env.element
        if (e.structure is not None and not e.undefined and
                e.structure.type != M.C_ANY):
            edef = e.structure
            if edef.final_state is not None and env.state is not None:
                return M.same_state(edef.final_state, env.state)
            if edef.final_state is not None and env.state is None:
                return False
        return True

    def validate_completeness(self, env):
        if not self.complete(env):
            self.gripe(*Gripes.validate(
                "Incomplete element: <%s>" % env.element.name))

    def allow_for(self, in_e, e):
        """Tag-soup adaptation of undefined elements
        (parser.c:2851-2890)."""
        dtd = self.dtd
        edef = in_e.structure
        cow = dtd._cow
        # accretive base + undefined parent: the reference's
        # allow_for here is a silent monotonic set-add (membership
        # checked before append; no gripe, order-independent), so the
        # grown content model PERSISTS across documents instead of
        # journaling — re-running it warm is a no-op.  This was the
        # r8 accretive design's missing piece: journaled edef
        # rollbacks re-cold-started every element's model each doc
        # AND purged their tag memos (elems set), pinning the xml
        # corpus at ~2.7 MB/s.
        accrete = dtd.accretive and in_e.undefined
        if cow is not None and not accrete:
            cow.edef(in_e, edef)
        mutated = False
        if edef.type == M.C_EMPTY:
            edef.type = M.C_PCDATA
            edef.content = M.Model(M.MT_OR, M.MC_REP)
            mutated = True
        g = edef.content.group
        if e is M.CDATA_ELEMENT:
            for m in g:
                if m.type == M.MT_PCDATA:
                    break
            else:
                g.append(M.Model(M.MT_PCDATA, M.MC_ONE))
                mutated = True
        else:
            for m in g:
                if m.type == M.MT_ELEMENT and m.element is e:
                    break
            else:
                m = M.Model(M.MT_ELEMENT, M.MC_ONE)
                m.element = e
                g.append(m)
                mutated = True
        if mutated and accrete:
            # flush the compiled executor's cached element flags /
            # transitions for this DTD once per NEW (parent, child)
            # pair ever — warm documents never reach here
            dtd._omit_gen[0] += 1

    def open_element(self, e, warn):
        """(parser.c:2895-3014)."""
        if e is M.CDATA_ELEMENT and self.environments:
            # memoized repeat transition (#PCDATA self-loops dominate)
            env = self.environments[-1]
            memo = env.cdata_memo
            if memo is not None and memo[0] is env.state:
                env.state = memo[1]
                return True
        if (not self.environments and self.dtd.doctype is None and
                e is not M.CDATA_ELEMENT and self.options.catalog):
            # catalog auto-load on first element (parser.c:2920-2939):
            # no DOCTYPE seen, first tag names a known doctype
            dtd_text = self.options.catalog.get(e.name)
            if dtd_text is not None:
                self.gripe(*Gripes.no_doctype(e.name, e.name + ".dtd"))
                self.load_dtd_text(dtd_text)
                self.dtd.doctype = e.name
        if not self.environments and self.enforce_outer_element:
            f = self.dtd.find_element(self.enforce_outer_element)
            if f is not None and f is not e:
                if f.structure is None or not f.structure.omit_open:
                    self.gripe(*Gripes.omitted_open(f.name))
                old = self.event_class
                self.event_class = EV_OMITTED
                try:
                    self.open_element(f, True)
                    atts = []
                    if self.options.defaults:
                        self.add_default_attributes(f, atts)
                    self._emit_begin(f, atts)
                finally:
                    self.event_class = old

        if self.environments:
            env = self.environments[-1]
            if env.element.undefined:
                self.allow_for(env.element, e)
                if e is M.CDATA_ELEMENT:
                    # undefined parents accept #PCDATA with no state
                    # change: memoize the no-op so every later data
                    # span in this env is a dict probe, not an
                    # allow_for walk (DTD-less xml steady state)
                    env.cdata_memo = (env.state, env.state)
                self.push_element(e, False)
                return True
            if (env.element.structure is not None and
                    env.element.structure.type == M.C_ANY):
                if e is not M.CDATA_ELEMENT and e.undefined:
                    self.gripe(*Gripes.existence("Element", e.name))
                self.push_element(e, False)
                return True
            inex = self._in_or_excluded(e)
            if inex == "included":
                self.push_element(e, False)
                return True
            if inex == "excluded" and warn:
                self.gripe(*Gripes.not_allowed(e.name))
            # walk up for omit-close parents (parser.c:2962-2996)
            idx = len(self.environments) - 1
            while idx >= 0:
                env = self.environments[idx]
                new = M.make_dtd_transition(env.state, e)
                if new is not None:
                    top = len(self.environments) - 1
                    if e is M.CDATA_ELEMENT and idx == top:
                        env.cdata_memo = (env.state, new)
                    env.state = new
                    if idx != top:
                        self.pop_to(idx, e)
                    self.push_element(e, False)
                    return True
                path = M.find_omitted_path(env.state, e,
                                           self.dtd._omit_gen)
                if path is not None and len(path) > 0:
                    self.pop_to(idx, e)
                    old = self.event_class
                    self.event_class = EV_OMITTED
                    try:
                        for oe in path:
                            env.state = M.make_dtd_transition(env.state, oe)
                            env = self.push_element(oe, True)
                    finally:
                        self.event_class = old
                    env.state = M.make_dtd_transition(env.state, e)
                    self.push_element(e, False)
                    return True
                if (env.element.structure is None or
                        not env.element.structure.omit_close):
                    break
                idx -= 1
            if warn:
                if e is M.CDATA_ELEMENT:
                    self.gripe(*Gripes.validate("#PCDATA not allowed here"))
                elif e.undefined:
                    self.gripe(*Gripes.existence("Element", e.name))
                else:
                    self.gripe(*Gripes.not_allowed(e.name))
        if warn:
            self.push_element(e, False)
            return True
        return False

    def _in_or_excluded(self, e):
        """(parser.c:2691-2709)."""
        dtd = self.dtd
        if not dtd.has_inex:
            return "normal"
        # membership pre-filter: elements that appear in NO +(..)/-(..)
        # list anywhere in the DTD can't be included or excluded --
        # one set lookup instead of an environment-stack walk
        members = dtd._inex_members
        if members is None:
            members = set()
            for el in dtd.elements.values():
                edef = el.structure
                if edef is not None:
                    for x in edef.excluded:
                        members.add(id(x))
                    for x in edef.included:
                        members.add(id(x))
            dtd._inex_members = members
        if id(e) not in members:
            return "normal"
        for env in reversed(self.environments):
            edef = env.element.structure
            if edef is not None:
                for el in edef.excluded:
                    if el is e:
                        return "excluded"
                for el in edef.included:
                    if el is e:
                        return "included"
        return "normal"

    def close_element(self, e, conref):
        """(parser.c:3017-3050)."""
        envs = self.environments
        open_idx = None
        for idx in range(len(envs) - 1, -1, -1):
            if envs[idx].element is e:
                open_idx = idx
                break
        if open_idx is None:
            return self.gripe(*Gripes.not_open(e.name))
        while len(envs) > open_idx:
            env = envs[-1]
            ce = env.element
            if not (conref and len(envs) - 1 == open_idx and ce is e):
                self.validate_completeness(env)
            self.first = False
            self.ev_end(ce.name)
            envs.pop()
            if ce is e:
                self.map = envs[-1].map if envs else None
                return True
            if ce.structure is not None and not ce.structure.omit_close:
                self.gripe(*Gripes.omitted_close(ce.name))
        return True

    def close_current_element(self):
        if self.environments:
            e = self.environments[-1].element
            self.emit_cdata(last=True)
            return self.close_element(e, False)
        return self.gripe(*Gripes.syntax_error("No element to close", ""))

    def process_net(self):
        """NET (/) closing for shorttag (parser.c:3610-3641)."""
        self.prepare_cdata()
        for idx in range(len(self.environments) - 1, -1, -1):
            env = self.environments[idx]
            if env.wants_net:
                self.pop_to(idx, None)
                self.validate_completeness(env)
                self.emit_cdata(last=True)
                self.first = False
                self.ev_end(env.element.name)
                self.environments.pop()
                self.map = (self.environments[-1].map
                            if self.environments else None)
                return True
        return False

    # ------------------------------------------------------------------
    # attributes (parser.c:3111-3495)
    # ------------------------------------------------------------------

    def process_attributes(self, e, decl, i, atts):
        """(parser.c:3290-3375).  atts: list of (Attr, raw_value)."""
        dtd = self.dtd
        i = self.iskip_layout(decl, i)
        while i < len(decl):
            r = self.itake_nmtoken(decl, i)
            if r is None:
                return i
            nm, i2 = r
            if i2 < len(decl) and decl[i2] == '=':      # name=value
                if not (nm and (nm[0].isalpha() or nm[0] in ':_' or
                                ord(nm[0]) > 191)):
                    self.gripe(*Gripes.syntax_warning(
                        "Illegal start of attribute-name", decl[i2:]))
                i = i2 + 1
                a = e.find_attribute(nm)
                if a is None:
                    a = D.Attr(nm)
                    a.type = D.AT_CDATA
                    a.def_ = D.AT_IMPLIED
                    a.implicit = True
                    # data-* per the reference (parser.c:3324-3325);
                    # aria-* added: the same spec-blessed wildcard
                    # family (ARIA applies to every HTML5 element)
                    gripes = not e.undefined and not (
                            dtd.dialect in D.XML_DIALECTS and
                            (nm == "xmlns" or nm.startswith("xmlns:"))
                    ) and not (
                            dtd.dialect in D.HTML5_DIALECTS and
                            nm.startswith(("data-", "aria-")))
                    if dtd._cow is not None and not (
                            dtd.accretive and e.undefined):
                        # accretive base + undefined element: the
                        # implicit attr is silent (gripes is False by
                        # construction above) and value-equivalent on
                        # every future use, so it persists with the
                        # element instead of journaling (r8)
                        dtd._cow.attrs(
                            e, griping_attr=a if gripes else None)
                    self._add_attribute(e, a)
                    if gripes:
                        self.gripe(*Gripes.no_attribute(e.name, nm))
                r2 = self.get_attribute_value(decl, i, a)
                if r2 is None:
                    return i
                value, i = r2
                atts.append((a, value))
            elif e.structure is not None:
                # value shorthand <tag value> (parser.c:3334-3361)
                found = False
                for a in e.attributes:
                    if a.type in (D.AT_NAMEOF, D.AT_NOTATION) and \
                            nm in a.nameof:
                        if dtd.dialect in D.XML_DIALECTS:
                            self.gripe(*Gripes.syntax_warning(
                                "Value short-hand in XML mode", decl[i:]))
                        atts.append((a, nm))
                        found = True
                        break
                if not found:
                    self.gripe(*Gripes.no_attribute_value(e.name, nm))
                    # reference clobbers decl with the NULL result of
                    # the '=' probe here (parser.c:3360-3362), so the
                    # caller re-gripes with the whole attribute string
                    return None
                i = i2
            else:
                self.gripe(*Gripes.syntax_error("Bad attribute", decl[i:]))
                return None
        return i

    def get_attribute_value(self, decl, i, a):
        """(parser.c:3111-3287).  Returns (value, next_i) or None.
        value is the final Python value (str/int/list)."""
        dtd = self.dtd
        DIG_FIRST, NAM_FIRST, NAM_LATER, ANY_OTHER = 8, 4, 2, 1
        token = 0

        r = self.itake_string_span(decl, i)
        if r is not None:
            a0, b0, end = r
            expanded = self.expand_entities_attr(decl, a0, b0)
            if a.type == D.AT_CDATA:
                return expanded, end
            # canonicalise blanks + classify + case-fold
            words = []
            for w in _split_blanks(expanded):
                if not w:
                    continue
                c0 = w[0]
                token |= (DIG_FIRST if c0.isdigit()
                          else NAM_FIRST if is_name_char(c0) else ANY_OTHER)
                for c in w[1:]:
                    token |= (0 if c.isdigit()
                              else NAM_LATER if is_name_char(c)
                              else ANY_OTHER)
                words.append(w if dtd.att_case_sensitive else w.lower())
            buf = ' '.join(words)
        else:
            r = self.itake_unquoted(decl, i)
            if r is None:
                return None
            buf, end = r
            if buf:
                c0 = buf[0]
                token |= (DIG_FIRST if c0.isdigit()
                          else NAM_FIRST if is_name_char(c0) else ANY_OTHER)
                for c in buf[1:]:
                    token |= (0 if c.isdigit()
                              else NAM_LATER if is_name_char(c) else ANY_OTHER)
            if token == 0 or (token & ANY_OTHER):
                self._rq_gripes = getattr(self, "_rq_gripes", 0) + 1
                self.gripe(*Gripes.syntax_warning(
                    "Attribute value requires quotes", buf))
            if not dtd.att_case_sensitive and a.type != D.AT_CDATA:
                buf = buf.lower()

        t = a.type
        if t == D.AT_NUMBER:
            if token != DIG_FIRST:
                self.gripe(*Gripes.syntax_warning("NUMBER expected",
                                                  decl[i:]))
                return 0, end           # textW NULL -> integer 0
            if dtd.number_mode_integer:
                try:
                    return int(buf), end
                except ValueError:
                    return 0, end
            return buf, end
        if t == D.AT_CDATA:
            return buf, end
        if t in (D.AT_ID, D.AT_IDREF, D.AT_NAME, D.AT_NOTATION):
            if token == 0 or (token & (DIG_FIRST | ANY_OTHER)):
                self.gripe(*Gripes.syntax_warning("NAME expected", decl[i:]))
        elif t in (D.AT_NAMEOF, D.AT_NMTOKEN):
            if token == 0 or (token & ANY_OTHER):
                self.gripe(*Gripes.syntax_warning("NMTOKEN expected",
                                                  decl[i:]))
            if t == D.AT_NAMEOF:
                for nv in a.nameof:
                    if dtd.att_case_preserving:
                        if nv.lower() == buf.lower():
                            break
                    else:
                        if nv == buf:
                            break
                else:
                    self.gripe(*Gripes.syntax_warning("unexpected value",
                                                      decl[i:]))
        elif t == D.AT_NUTOKEN:
            if token & (NAM_FIRST | ANY_OTHER):
                self.gripe(*Gripes.syntax_warning("NUTOKEN expected",
                                                  decl[i:]))
        elif t == D.AT_ENTITY:
            if token == 0 or (token & (DIG_FIRST | ANY_OTHER)):
                self.gripe(*Gripes.syntax_warning("entity NAME expected",
                                                  decl[i:]))
        elif t in (D.AT_NAMES, D.AT_IDREFS):
            if token == 0 or (token & (DIG_FIRST | ANY_OTHER)):
                self.gripe(*Gripes.syntax_warning("NAMES expected", decl[i:]))
        elif t == D.AT_ENTITIES:
            if token == 0 or (token & (DIG_FIRST | ANY_OTHER)):
                self.gripe(*Gripes.syntax_warning("entity NAMES expected",
                                                  decl[i:]))
        elif t == D.AT_NMTOKENS:
            if token == 0 or (token & ANY_OTHER):
                self.gripe(*Gripes.syntax_warning("NMTOKENS expected",
                                                  decl[i:]))
        elif t == D.AT_NUMBERS:
            if token != DIG_FIRST:
                self.gripe(*Gripes.syntax_warning("NUMBERS expected",
                                                  decl[i:]))
        elif t == D.AT_NUTOKENS:
            if token & (NAM_FIRST | ANY_OTHER):
                self.gripe(*Gripes.syntax_warning("NUTOKENS expected",
                                                  decl[i:]))
        return buf, end

    def add_default_attributes(self, e, atts):
        """(parser.c:3385-3445)."""
        if e is M.CDATA_ELEMENT:
            return
        for a in e.default_attributes():
            if any(pa is a for pa, _v in atts):
                continue
            atts.append((a, a.default))

    def convert_attributes(self, atts):
        """Attribute values -> Prolog-equivalent Python values
        (sgml2pl.c:1020-1125 put_attribute_value)."""
        out = []
        for a, v in atts:
            if a.type == D.AT_CDATA:
                out.append((a.name, v if v is not None else ""))
            elif a.type == D.AT_NUMBER:
                if v is None:
                    out.append((a.name, 0))
                else:
                    out.append((a.name, v))
            elif a.islist:
                if v is None:
                    out.append((a.name, []))
                elif isinstance(v, str):
                    parts = _split_blanks_ws(v)
                    if a.type == D.AT_NUMBERS and self.dtd.number_mode_integer:
                        conv = []
                        for p in parts:
                            try:
                                conv.append(int(p))
                            except ValueError:
                                conv.append(p)
                        parts = conv
                    out.append((a.name, parts))
                else:
                    out.append((a.name, v))
            else:
                out.append((a.name, v if v is not None else ""))
        return out

    # ------------------------------------------------------------------
    # entities (parser.c:419-678, 4475-4589)
    # ------------------------------------------------------------------

    def entity_value(self, e):
        """(parser.c:449-466): literal value or resolved file content."""
        if e.value is None and self.resolver is not None and \
                e.type in (D.ET_SYSTEM, D.ET_PUBLIC):
            content = self.resolver(e)
            if content is not None:
                if isinstance(content, bytes):
                    content = content.decode("latin-1")
                if e.content in (D.EC_SGML, D.EC_CDATA):
                    content = _normalise_rsre(content)
                e.value = content
        return e.value

    def expand_entities_attr(self, s, start=0, stop=None):
        """Entity expansion inside quoted attribute values
        (parser.c:600-678): blanks map to space, CRLF folds.
        `s[start:stop]` is the value; gripes print the remainder of
        the *whole* declaration buffer like the reference (which gets
        a non-NUL-terminated (start,len) window into the tag)."""
        sub = s[start:] if stop is None else s[start:stop]
        if '&' not in sub and sub.isascii():
            # entity-free fast path: blanks->space with CRLF fold
            return sub.replace('\r\n', '\n').translate(_BLANK2SPACE)
        out = []
        i = start
        n = len(s) if stop is None else stop
        dtd = self.dtd
        while i < n:
            c = s[i]
            if c == '&':
                r = isee_character_entity(s, i)
                if r is not None and r[1] <= n:
                    chr_, j = r
                    if chr_ == 0:
                        self.gripe(*Gripes.syntax_error(
                            "Illegal character entity", s[i:]))
                    out.append(safe_chr(chr_))
                    i = j
                    continue
                if i + 1 < n and is_nmstart_char(s[i + 1]):
                    r2 = self.itake_name(s, i + 1)
                    if r2 is not None:
                        name, j = r2
                        if j < n and (s[j] == ';' or s[j] == LF):
                            j += 1
                        e = self.dtd.entities.get(name) or \
                            self.dtd.default_entity
                        if e is None:
                            self.gripe(*Gripes.existence("entity", name))
                            i, c = self._attr_recover(s, i, out)
                            continue
                        ev = self.entity_value(e)
                        if ev is None:
                            self.gripe(*Gripes.no_value(e.name))
                            i, c = self._attr_recover(s, i, out)
                            continue
                        if e.content == D.EC_SGML:
                            out.append(self.expand_entities_attr(ev))
                        else:
                            out.append(ev)
                        i = j
                        continue
                if dtd.dialect in D.XML_DIALECTS:
                    self.gripe(*Gripes.syntax_error("Illegal entity", s[i:]))
            if c == CR and i + 1 < n and s[i + 1] == LF:
                i += 1
                c = LF
            if is_blank_char(c):
                out.append(' ')
            else:
                out.append(c)
            i += 1
        return ''.join(out)

    @staticmethod
    def _attr_recover(s, i, out):
        """Recovery tail after a failed entity ref in an attribute
        value (parser.c:664-676 `recover:` label)."""
        out.append(s[i])
        return i + 1, None

    def itake_string_span(self, s, i):
        """itake_string returning (start, stop, next_i) span indices."""
        i = self.iskip_layout(s, i)
        n = len(s)
        if i >= n or s[i] not in ('"', "'"):
            return None
        q = s[i]
        j = s.find(q, i + 1)
        if j < 0:
            return None
        return i + 1, j, self.iskip_layout(s, j + 1)

    def process_entity(self, name):
        """(parser.c:4475-4589).

        Populates dtd._ent_fast with replayable expansions for the
        steady-state executor: kind 0 = numeric char ref (plain
        append, no blank handling — reference parity), kind 1 = named
        entity resolving to one character (blank-open + append),
        kind 2 = EC_CDATA text (blank-open + extend).  The cache is
        invalidated by any ENTITY/ELEMENT/ATTLIST declaration."""
        from .entities import char_entity_value
        if name.startswith('#'):
            v = char_entity_value(name)
            if v <= 0:
                return self.gripe(*Gripes.syntax_error(
                    "Bad character entity", name))
            c = safe_chr(v)
            fast = self.dtd._ent_fast
            if fast is not None and len(fast) < 4096:
                fast[name] = (c, 0)
            self.cdata.append(c)
            return True
        dtd = self.dtd
        e = dtd.entities.get(name)
        if e is None:
            if dtd.default_entity is not None:
                e = dtd.default_entity
            else:
                return self.gripe(*Gripes.existence("entity", name))
        if e.value is None and e.content == D.EC_SGML and \
                e.type in (D.ET_SYSTEM, D.ET_PUBLIC):
            if not dtd.system_entities:
                return self.gripe(*Gripes.et_system(e.exturl))
            content = self.resolver(e) if self.resolver else None
            if content is None:
                return self.gripe(*Gripes.existence("entity", name))
            if isinstance(content, bytes):
                content = content.decode("latin-1")
            return self.process_entity_chars(e, _normalise_rsre(content))
        text = self.entity_value(e)
        if text is None:
            return self.gripe(*Gripes.no_value(e.name))
        if e.content in (D.EC_SGML, D.EC_CDATA):
            r = isee_character_entity(text, 0)
            if r is not None and r[1] >= len(text):
                chr_, _j = r
                if chr_ == 0:
                    return self.gripe(*Gripes.syntax_error(
                        "Illegal character entity", text))
                c = safe_chr(chr_)
                fast = dtd._ent_fast
                if fast is not None and len(fast) < 4096 and \
                        dtd.entities.get(name) is e:
                    fast[name] = (c, 1)
                if self.blank_cdata and not is_blank_char(c):
                    self.cdata_must_be_empty = not self.open_element(
                        M.CDATA_ELEMENT, False)
                    self.blank_cdata = False
                self.cdata.append(c)
                return True
            if e.content == D.EC_SGML:
                return self.process_entity_chars(e, text)
            fast = dtd._ent_fast
            if fast is not None and len(fast) < 4096 and \
                    dtd.entities.get(name) is e:
                fast[name] = (text, 2)
            if text:
                if self.blank_cdata:
                    self.cdata_must_be_empty = not self.open_element(
                        M.CDATA_ELEMENT, False)
                    self.blank_cdata = False
                self.cdata.extend(text)
            return True
        if e.content in (D.EC_SDATA, D.EC_NDATA):
            self.process_cdata(last=False)
            self.ev_data("sdata" if e.content == D.EC_SDATA else "ndata",
                         text)
            return True
        if e.content == D.EC_PI:
            self.process_cdata(last=False)
            self.ev_pi(text)
            return True
        return True

    def process_entity_chars(self, e, text):
        """Re-tokenize an EC_SGML entity value (parser.c:4537-4548).
        Depth-limited against recursive entity bombs."""
        depth = getattr(self, "_ent_depth", 0)
        if depth >= 32:
            return self.gripe(*Gripes.resource("entity nesting"))
        self._ent_depth = depth + 1
        try:
            return self._process_entity_chars_inner(e, text)
        finally:
            self._ent_depth = depth

    def _process_entity_chars_inner(self, e, text):
        self.push_location()
        self._entity_startloc.append(self.startloc)
        old_decode = self.utf8_decode
        self.utf8_decode = False
        old_buffer = self.buffer
        self.buffer = []
        self.line = 1
        self.linepos = 0
        self.charpos = 0
        # indexed frame instead of a plain for-loop: a re-entrant
        # parse_content() fired from a callback inside this expansion
        # consumes a slice of `text` directly and advances frame[0]
        # past it (charpos tracks the frame index 1:1 here — it was
        # reset above and putchar bumps it once per char)
        frame = [0]
        self._ent_frames.append((text, frame, [0]))
        n = len(text)
        putchar = self.putchar
        try:
            while frame[0] < n:
                c = text[frame[0]]
                frame[0] += 1
                putchar(c)
        finally:
            self._ent_frames.pop()
            self.utf8_decode = old_decode
            self.buffer = old_buffer
            self._entity_startloc.pop()
            self.pop_location()
        return True

    def process_include(self, entity_name):
        """%name; in DTD (parser.c:4093-4119)."""
        pe = self.dtd.pentities.get(entity_name)
        if pe is not None:
            text = self.entity_value(pe)
            if text is None:
                return self.gripe(*Gripes.no_value(pe.name))
            return self.process_entity_chars(pe, text)
        return self.gripe(*Gripes.existence("parameter entity", entity_name))

    # ------------------------------------------------------------------
    # processing instructions (parser.c:3859-3931)
    # ------------------------------------------------------------------

    def process_pi(self, decl):
        dtd = self.dtd
        r = self.isee_identifier(decl, 0, "xml")
        if r is not None:
            if dtd.dialect == D.DL_SGML:
                self.set_dialect("xml")
            elif dtd.dialect == D.DL_HTML:
                self.set_dialect("xhtml")
            elif dtd.dialect == D.DL_HTML5:
                self.set_dialect("xhtml5")
            i = r
            while i < len(decl):
                r2 = self.itake_name(decl, i)
                if r2 is not None and r2[1] < len(decl) and \
                        decl[r2[1]] == '=':
                    nm, j = r2
                    j += 1
                    r3 = self.itake_string(decl, j)
                    if r3 is None:
                        # nmtoken chars fallback
                        k = self.iskip_layout(decl, j)
                        if k < len(decl) and is_name_char(decl[k]):
                            k2 = k
                            while k2 < len(decl) and is_name_char(decl[k2]):
                                k2 += 1
                            r3 = (decl[k:k2], self.iskip_layout(decl, k2))
                    if r3 is not None:
                        val, i = r3
                        if nm.lower() == "encoding":
                            self.xml_set_encoding(val)
                        continue
                self.gripe(*Gripes.syntax_error("Illegal XML parameter",
                                                decl[i:]))
                break
            return True
        self.ev_pi(decl)
        return False

    # ------------------------------------------------------------------
    # end of document (parser.c:4597-4679)
    # ------------------------------------------------------------------

    def end_document(self):
        state = self.state
        if state in (S_RCDATA, S_CDATA, S_PCDATA):
            pass
        elif state in (S_CMT, S_CMTE0, S_CMTE1, S_DECLCMT0, S_DECLCMT,
                       S_DECLCMTE0):
            self.gripe(*Gripes.syntax_error(
                "Unexpected end-of-file in comment", ""))
        elif state in (S_MSCDATA, S_EMSCDATA1, S_EMSCDATA2):
            self.gripe(*Gripes.syntax_error(
                "Unexpected end-of-file in CDATA marked section", ""))
        elif state in (S_PI, S_PI2):
            self.gripe(*Gripes.syntax_error(
                "Unexpected end-of-file in processing instruction", ""))
        elif state == S_UTF8:
            self.gripe(*Gripes.syntax_error(
                "Unexpected end-of-file in UTF-8 sequence", ""))
        else:
            self.gripe(*Gripes.syntax_error("Unexpected end-of-file", ""))

        if self.dmode == DM_DATA:
            if self.cdata and self.cdata[-1] == CR:
                self.cdata.pop()
            self.process_cdata(last=True)
            if self.environments:
                self.pop_to(0, M.CDATA_ELEMENT)
                env = self.environments[0]
                e = env.element
                if e.structure is not None and not e.structure.omit_close:
                    self.gripe(*Gripes.omitted_close(e.name))
                self.close_element(e, False)

    # ------------------------------------------------------------------
    # DTD loading helper (driver-side; load_dtd analog sgml.pl:274-316)
    # ------------------------------------------------------------------

    def load_dtd_text(self, text):
        """Parse DTD declarations from text (DM_DTD mode)."""
        if isinstance(text, bytes):
            text = text.decode("latin-1")
        old_dmode = self.dmode
        old_state = self.state
        old_decode = self.utf8_decode
        old_buffer = self.buffer
        self.dmode = DM_DTD
        self.state = S_PCDATA
        self.buffer = []
        try:
            for c in text:
                self.putchar(c)
        finally:
            self.dmode = old_dmode
            self.state = old_state
            self.utf8_decode = old_decode
            self.buffer = old_buffer


# ----------------------------------------------------------------------
# module helpers
# ----------------------------------------------------------------------

import re as _re

_ASCII_BLANK_RUN = _re.compile(r'[ \t\r\n]+')


def collapse_blanks(s, trim=False):
    """SP_DEFAULT / SP_REMOVE blank squeezing (parser.c:4312-4374)."""
    if s.isascii():
        out = _ASCII_BLANK_RUN.sub(' ', s)
    else:
        parts = []
        run = False
        for c in s:
            if is_blank_char(c):
                run = True
                continue
            if run and parts:
                parts.append(' ')
            elif run and not parts and not trim:
                parts.append(' ')
            run = False
            parts.append(c)
        if run and not trim:
            parts.append(' ')
        out = ''.join(parts)
    if trim:
        out = out.strip(' \t\r\n') if s.isascii() else out.strip()
    return out


def _split_blanks(s):
    """Split on CH_BLANK runs (space/tab/CR/LF + wide spaces)."""
    if s.isascii():
        return _ASCII_BLANK_RUN.split(s)
    parts = []
    cur = []
    for c in s:
        if is_blank_char(c):
            parts.append(''.join(cur))
            cur = []
        else:
            cur.append(c)
    parts.append(''.join(cur))
    return parts


def _split_blanks_ws(s):
    """istrblank split (sgml2pl.c:1044-1052): iswspace separators,
    empty leading tokens skipped except a lone empty value."""
    parts = []
    cur = []
    for c in s:
        if c.isspace():
            parts.append(''.join(cur))
            cur = []
        else:
            cur.append(c)
    parts.append(''.join(cur))
    # sgml2pl skips empty tokens from consecutive blanks but keeps
    # a final empty token; replicate: drop empties except keep one
    # if all are empty
    nonempty = [p for p in parts if p != '']
    if nonempty:
        if parts and parts[-1] == '' and len(parts) > 1 and not nonempty:
            nonempty.append('')
        return nonempty
    return ['']


def _normalise_rsre(s):
    """load_sgml_file_to_charp normalisation (util.c:715-800):
    ensure \\n are preceded by \\r (RS/RE model) for entity files."""
    return s.replace('\r\n', '\n').replace('\n', '\r\n')


def parse_document(data, dialect="sgml", **kw):
    """Convenience one-shot parse: returns (dom, errors)."""
    p = SGMLParser(ParserOptions(dialect=dialect, **kw))
    return p.parse(data)


def _load(source, dialect, **kw):
    """load_structure/3 core (sgml.pl:390-459): accepts a path
    (str/os.PathLike), a file object, bytes, or a markup string;
    returns the DOM content list.  A markup-free str is ALWAYS a
    path (like the reference's atom-is-a-filename rule) — a missing
    file raises instead of silently parsing the string, so the same
    call can't mean different things depending on CWD contents."""
    import os
    if hasattr(source, "read"):
        data = source.read()
    elif isinstance(source, os.PathLike):
        with open(os.fspath(source), "rb") as f:
            data = f.read()
    elif isinstance(source, str) and "<" not in source and \
            "\n" not in source:
        with open(source, "rb") as f:
            data = f.read()
    else:
        data = source
    dom, _errors = parse_document(data, dialect=dialect, **kw)
    return dom


def load_html(source, **kw):
    """load_html/3 analog (sgml.pl:605-640): path/file/bytes -> DOM
    content list, HTML dialect with tag-soup recovery."""
    kw.setdefault("max_errors", -1)
    kw.setdefault("quiet", True)
    kw.setdefault("encoding", "utf-8")
    return _load(source, "html5", **kw)


def load_xml(source, **kw):
    """load_xml/3 analog."""
    kw.setdefault("encoding", "utf-8")
    return _load(source, "xml", **kw)


def load_sgml(source, **kw):
    """load_sgml/3 analog."""
    return _load(source, "sgml", **kw)


# ----------------------------------------------------------------------
# XMLNS support (xmlns.c:40-268, sgml2pl.c:986-1041) — mixed into
# SGMLParser below
# ----------------------------------------------------------------------

def _isxmlns(name):
    """'xmlns' -> '' ; 'xmlns:px' -> 'px' ; else None
    (xmlns.c:101-111)."""
    if name == "xmlns":
        return ""
    if name.startswith("xmlns:"):
        return name[6:]
    return None


def _xmlns_update(self, e, atts):
    """Push xmlns bindings from this element's attributes
    (xmlns.c:117-138); bindings live on the just-opened env."""
    env = self.environments[-1] if self.environments else None
    if env is None:
        return
    for a, v in atts:
        px = _isxmlns(a.name)
        if px is not None and a.type == D.AT_CDATA and v is not None:
            if env.xmlns is None:
                env.xmlns = []
            env.xmlns.append((px or None, str(v)))


def _ns_default_pre(stack):
    """Innermost DEFAULT-namespace binding of a drain replica stack
    -> the "url:" prefix unprefixed element names resolve to
    (xmlns.c:79-98 with prefix=None + the no-hook put_url identity).
    "" when unbound or bound to the empty url (xmlns='')."""
    for frames in reversed(stack):
        if frames:
            for px, url in reversed(frames):
                if px is None:
                    return url + ":" if url else ""
    return ""


def _xmlns_find(self, prefix):
    """(xmlns.c:79-98): innermost binding for prefix (None =
    default ns).  While draining a C tape, _ns_drain is the
    region-time frame stack and replaces the env walk."""
    frames = self._ns_drain
    if frames is not None:
        for lst in reversed(frames):
            if lst:
                for px, url in reversed(lst):
                    if px == prefix:
                        return url
        return None
    for env in reversed(self.environments):
        if env.xmlns:
            for px, url in reversed(env.xmlns):
                if px == prefix:
                    return url
    return None


def _xmlns_resolve_element(self, name):
    """Element name -> DOM name (sgml2pl.c:1014-1041 +
    xmlns.c:210-266).  Sets env.thisns for attribute defaults.
    With keep_prefix(true) returns a QName (ns(P,U):L analog).
    During a tape drain the env stack is post-region state, so env
    mutations (thisns, implicit prefix defs) are skipped — the C
    gate keeps mutating names (prefixed) off the tape.

    Drain fast path (r7): bindings are constant between drain pops
    and tape begins are ':'-free (shape/memo xmlns gate), so the
    resolved name memoizes in _ns_drain_names; _put_url already
    dedups on_urlns hook calls (URL_CACHE mirror), and the only
    griping branch (undefined prefix) is unreachable for ':'-free
    names, so the memo is observation-equivalent."""
    memo = self._ns_drain_names
    if memo is not None:
        r = memo.get(name)
        if r is not None:
            return r
    env = (self.environments[-1]
           if self._ns_drain is None and self.environments else None)
    kp = self.dtd.keep_prefix
    if ':' in name:
        prefix, local = name.split(':', 1)
        url = self._xmlns_find(prefix)
        if url is not None:
            url = self._put_url(url)
            if env is not None:
                env.thisns = (prefix, url)
            if kp:
                return QName(prefix, url, local)
            return "%s:%s" % (url, local) if url else local
        # undefined: url = prefix itself, defined implicitly
        if env is not None:
            if env.xmlns is None:
                env.xmlns = []
            env.xmlns.append((prefix, prefix))
            env.thisns = (prefix, prefix)
        self.gripe(*Gripes.existence("namespace", prefix))
        if kp:
            return QName(prefix, prefix, local)
        return "%s:%s" % (prefix, local)
    url = self._xmlns_find(None)
    if url:
        url = self._put_url(url)
    if env is not None:
        env.thisns = (None, url) if url else None
    if url:
        r = QName("", url, name) if kp else "%s:%s" % (url, name)
    else:
        r = name
    if memo is not None:
        memo[name] = r
    return r


def _xmlns_resolve_attr(self, name, qualify=False):
    """(xmlns.c:151-202): prefixed attrs resolve; unprefixed only
    under qualify_attributes.  keep_prefix -> QName."""
    kp = self.dtd.keep_prefix
    if ':' in name:
        prefix, local = name.split(':', 1)
        if prefix.startswith("xml"):
            # xml*/xmlns reserved: URI slot = literal prefix text,
            # prefix slot empty (xmlns.c:166-171)
            if kp:
                return QName("", prefix, local)
            return "%s:%s" % (prefix, local)
        url = self._xmlns_find(prefix)
        if url is not None:
            url = self._put_url(url)
            if kp:
                return QName(prefix, url, local)
            return "%s:%s" % (url, local) if url else local
        self.gripe(*Gripes.existence("namespace", prefix))
        if kp:
            return QName("", prefix, local)
        return "%s:%s" % (prefix, local)
    if qualify and self._ns_drain is None and self.environments:
        env = self.environments[-1]
        if env.thisns and env.thisns[1]:
            if kp:
                return QName(env.thisns[0] or "", env.thisns[1], name)
            return "%s:%s" % (env.thisns[1], name)
    return name


SGMLParser.update_xmlns = _xmlns_update
SGMLParser._xmlns_find = _xmlns_find
SGMLParser._xmlns_resolve_element = _xmlns_resolve_element
SGMLParser._xmlns_resolve_attr = _xmlns_resolve_attr


class TextOnlyParser(SGMLParser):
    """Extraction fast path: accumulates character data only, skipping
    DOM construction and attribute conversion (used by the Spark
    extract operator when neither nodes nor dom_json are requested).
    Event order and space-mode semantics are identical — only the
    event sinks differ."""

    _FAST_BEGIN_NOOP = True      # _emit_begin is a no-op here
    _FAST_END_NOOP = True        # ev_end is a no-op here
    _FAST_DATA_DIRECT = True     # ev_data == text_parts.append

    def __init__(self, options=None, dtd=None):
        super().__init__(options, dtd)
        self.text_parts = []

    def _emit_begin(self, e, atts):
        pass

    def ev_end(self, name):
        pass

    def ev_data(self, kind, text):
        # spans deliberately untracked: the text-only extract path
        # never reads data_spans (nodes=False) — see extract.py
        self.text_parts.append(text)

    def ev_pi(self, text):
        pass

    def text(self):
        return "".join(self.text_parts)


class TagCountParser(TextOnlyParser):
    """Element-name histogram without materializing anything: counts
    begin events (explicit AND implied — reference event classes
    EV_EXPLICIT/EV_OMITTED, parser.h:138-143) into a Counter.  Counts
    equal the DOM node table's per-name element counts exactly
    (pytest-asserted), at ~2.4x the query cost of building and
    shipping the node structs — the aggregate-don't-materialize path
    for crawl-scale tag analytics."""

    _FAST_BEGIN_NOOP = False    # _emit_begin is meaningful again
    _FAST_END_NOOP = True
    _FAST_DATA_DIRECT = False

    def __init__(self, options=None, dtd=None):
        super().__init__(options, dtd)
        from collections import Counter
        self.counts = Counter()

    def _emit_begin(self, e, atts):
        self.counts[e.name] += 1

    def ev_data(self, kind, text):
        pass

    def _drain_tape(self, ns_snap=None):
        """Counting drain: begins only, no position bookkeeping.
        ns_snap ignored: counts key on raw tag names in both modes
        (this parser's _emit_begin never resolves either)."""
        tape = self._c_tape
        counts = self.counts
        try:
            for ev in tape:
                if ev[0] == "b":
                    counts[ev[1][1].name] += 1
        finally:
            del tape[:]


class NodeTableParser(SGMLParser):
    """Node-table extraction fast path (r5): builds the FLAT node
    rows `dom.flatten_nodes` would produce — pre-order node_id,
    parent/ord, subtree_end, spans — directly in the event sinks,
    skipping both the Element-object DOM and the post-hoc recursive
    flatten (which profiled at ~45% of a nodes=True parse).  Row
    shape and values are identical to SGMLParser + flatten_nodes
    (pytest parity in tests/test_tape_mode.py); with the compiled
    executor's tape mode this takes the nodes=True extract path from
    ~8 to ~25+ MB/s per core.  Used by extract() when nodes=True and
    dom_json is not requested (dom_json still needs the tree)."""

    def __init__(self, options=None, dtd=None):
        super().__init__(options, dtd)
        self.rows = []
        self.text_parts = []
        self._open = []         # (row, child_counter) mirror stack
        self._root_ord = 0      # ord counter for top-level content

    # positions for begin rows are read directly at event time: the
    # values equal what _emit_begin appends to elem_spans (it runs
    # right before ev_begin with the same attrs)
    def ev_begin(self, name, attrs):
        rows = self.rows
        open_ = self._open
        if open_:
            top = open_[-1]
            parent_id = top[0]["node_id"]
            ord_ = top[1]
            top[1] += 1
        else:
            parent_id = -1
            ord_ = self._root_ord
            self._root_ord += 1
        row = {
            "node_id": len(rows), "parent_id": parent_id, "ord": ord_,
            "kind": "element",
            "name": name if isinstance(name, str) else str(name),
            "attrs": {(k if isinstance(k, str) else str(k)):
                      (" ".join(str(x) for x in v)
                       if isinstance(v, list) else str(v))
                      for k, v in attrs},
            "text": None, "subtree_end": None,
            "start_pos": self.startloc[2], "end_pos": self.charpos,
        }
        rows.append(row)
        open_.append([row, 0])

    def ev_end(self, name):
        if self._open:
            self._open.pop()[0]["subtree_end"] = len(self.rows)

    def _data_row(self, kind, text):
        rows = self.rows
        open_ = self._open
        if open_:
            top = open_[-1]
            parent_id = top[0]["node_id"]
            ord_ = top[1]
            top[1] += 1
        else:
            parent_id = -1
            ord_ = self._root_ord
            self._root_ord += 1
        start = self.startcdata[2]
        end = self.startloc[2] if self.startloc[2] > start \
            else self.charpos
        rows.append({"node_id": len(rows), "parent_id": parent_id,
                     "ord": ord_, "kind": kind, "name": None,
                     "attrs": None, "subtree_end": None,
                     "start_pos": start, "end_pos": end, "text": text})

    def ev_data(self, kind, text):
        self._data_row("text" if kind == "cdata" else kind, text)
        self.text_parts.append(text)

    def ev_pi(self, text):
        rows = self.rows
        open_ = self._open
        if open_:
            top = open_[-1]
            parent_id = top[0]["node_id"]
            ord_ = top[1]
            top[1] += 1
        else:
            parent_id = -1
            ord_ = self._root_ord
            self._root_ord += 1
        rows.append({"node_id": len(rows), "parent_id": parent_id,
                     "ord": ord_, "kind": "pi", "name": None,
                     "attrs": None, "subtree_end": None,
                     "start_pos": None, "end_pos": None, "text": text})

    def _drain_tape(self, ns_snap=None):
        """Tape drain specialised to row building: one tight loop,
        positions read straight from the tape tuples — no per-event
        method dispatch or startloc/startcdata save-restore.  Falls
        back to the generic drain when the positions option is on
        (the position attr needs base_file plumbing) or, on an xmlns
        region, when keep_prefix/on_urlns make name resolution
        object-producing or hook-dependent.

        Plain xmlns regions (r7) ride the fast loop: tape begins are
        binding-NEUTRAL by the C gate (binding-carrying tags —
        xmlns attrs, prefixed names, prefixed attrs — bail to Python
        pre-commit, cspeed._space_flag -2), so the only
        ns-dependent row value is the element name's DEFAULT-ns
        qualification (xmlns.c:210-266 with no prefix, no hook).
        The drain tracks the region-entry replica exactly like the
        generic drain (pre-region pops shrink it; in-region begins
        count as depth) and recomputes the default-url prefix only
        at replica pops — O(1) per event.  Unprefixed attrs never
        resolve with qualify_attributes off (xmlns.c:151-202), so
        the shared per-entry attr map stays valid."""
        if (self.options.positions and self.base_file) or \
                (ns_snap is not None and
                 (self.dtd.keep_prefix or
                  self.options.on_urlns is not None or
                  self.options.qualify_attributes)):
            return super()._drain_tape(ns_snap)
        tape = self._c_tape
        rows = self.rows
        open_ = self._open
        text_parts = self.text_parts
        dtd = self.dtd
        if ns_snap is not None:
            ns_stack = list(ns_snap)
            indepth = 0
            pre = _ns_default_pre(ns_stack)
            self._ns_drain = ns_stack   # one-off cold resolutions
        else:
            ns_stack = None
            pre = ""
        amap_cache = getattr(dtd, "_attr_row_cache", None)
        if amap_cache is None or len(amap_cache) > 16384:
            # bound across memo generations (declarations clear
            # _tag_memo; dead entries would otherwise pin here)
            amap_cache = dtd._attr_row_cache = {}
        try:
            for ev in tape:
                k = ev[0]
                if k == "d":
                    _k, s, scd, sl, cp = ev
                    start = scd[2]
                    if open_:
                        top = open_[-1]
                        parent_id = top[0]["node_id"]
                        ord_ = top[1]
                        top[1] += 1
                    else:
                        parent_id = -1
                        ord_ = self._root_ord
                        self._root_ord += 1
                    rows.append({
                        "node_id": len(rows), "parent_id": parent_id,
                        "ord": ord_, "kind": "text", "name": None,
                        "attrs": None, "subtree_end": None,
                        "start_pos": start,
                        "end_pos": sl[2] if sl[2] > start else cp,
                        "text": s})
                    text_parts.append(s)
                elif k == "b":
                    _k, entry, sl, cp = ev
                    hit = amap_cache.get(id(entry))
                    if hit is None:
                        # converted attrs are deterministic per memo
                        # entry (atts + attr defs are frozen in it;
                        # number_mode_integer is a DTD property) —
                        # build the map once and SHARE it across
                        # occurrences.  The cached strong ref keeps
                        # id(entry) from being reused.
                        e = entry[1]
                        amap = {a: (" ".join(str(x) for x in v)
                                    if isinstance(v, list) else str(v))
                                for a, v in
                                self.convert_attributes(entry[2])}
                        # prefixed names CANNOT appear on the tape
                        # (binding-carrying tags bail); if the gate
                        # invariant ever breaks, resolve per
                        # occurrence instead of caching wrong rows
                        prefixed = ":" in e.name or \
                            any(":" in k for k in amap)
                        hit = (entry, e.name, amap, prefixed)
                        if not (prefixed and ns_stack is not None):
                            amap_cache[id(entry)] = hit
                    if ns_stack is not None and hit[3]:
                        # cold safety path (gate violation): live
                        # resolution against the replica, per
                        # occurrence, no caching
                        name = str(self._xmlns_resolve_element(
                            hit[1]))
                        attrs = {str(self._xmlns_resolve_attr(k)): v
                                 for k, v in hit[2].items()}
                    else:
                        name = pre + hit[1] if pre else hit[1]
                        attrs = hit[2]
                    if open_:
                        top = open_[-1]
                        parent_id = top[0]["node_id"]
                        ord_ = top[1]
                        top[1] += 1
                    else:
                        parent_id = -1
                        ord_ = self._root_ord
                        self._root_ord += 1
                    row = {
                        "node_id": len(rows), "parent_id": parent_id,
                        "ord": ord_, "kind": "element",
                        "name": name, "attrs": attrs,
                        "text": None, "subtree_end": None,
                        "start_pos": sl[2], "end_pos": cp,
                    }
                    rows.append(row)
                    open_.append([row, 0])
                    if ns_stack is not None:
                        indepth += 1
                else:
                    if ns_stack is not None:
                        if indepth:
                            indepth -= 1
                        elif ns_stack:
                            ns_stack.pop()
                            pre = _ns_default_pre(ns_stack)
                    if open_:
                        open_.pop()[0]["subtree_end"] = len(rows)
        finally:
            self._ns_drain = None
            del tape[:]

    def finish_rows(self):
        """Close any still-open elements (EOF soup): flatten_nodes
        gives every element a subtree_end."""
        while self._open:
            self._open.pop()[0]["subtree_end"] = len(self.rows)
        return self.rows

    def text(self):
        """extract_text equivalent: all character data in document
        order (text + sdata + ndata rows, exactly what the DOM walk
        concatenates)."""
        return "".join(self.text_parts)


class FirstElementTextParser(TextOnlyParser):
    """Selective extraction: character data of the FIRST <target>
    element only, then stop the tokenizer — the SA_* stop-condition
    machinery (sgml2pl.c:1304-1310) keyed to a named element instead
    of the document root.  Skips attribute conversion and DOM
    construction entirely and abandons the byte stream as soon as the
    element closes: for <title> on a typical page that parses a few
    percent of the document."""

    _FAST_BEGIN_NOOP = False     # _emit_begin / ev_end / ev_data are
    _FAST_END_NOOP = False       # meaningful again in this subclass
    _FAST_DATA_DIRECT = False
    _TAPE_SINKS = False          # the whole point is the ev_end
                                 # StopParse abandoning the stream
                                 # early; tape mode would tokenize
                                 # past it in C first

    def __init__(self, options=None, dtd=None, target="title"):
        super().__init__(options, dtd)
        self.target = target
        self._depth = 0
        self.found = False

    def _emit_begin(self, e, atts):
        if self._depth:
            self._depth += 1
        elif e.name == self.target and not self.found:
            self._depth = 1
            self.found = True

    def ev_end(self, name):
        if self._depth:
            self._depth -= 1
            if self._depth == 0:
                self.stopped = True
                raise StopParse()

    def ev_data(self, kind, text):
        if self._depth:
            self.text_parts.append(text)

    def text(self):
        return "".join(self.text_parts) if self.found else None


def _put_url(self, url):
    """Map a namespace url through the on_urlns hook with a tiny MRU
    cache (sgml2pl.c:911-982 put_url, URL_CACHE=4): hook failure (or
    returning None) passes the url through; results cache for the
    parser's lifetime."""
    hook = self.options.on_urlns
    if hook is None or not url:
        return url
    for u, c in self._url_cache:
        if u == url:
            return c if c is not None else url
    try:
        canonical = hook(url)
    except Exception:   # noqa: BLE001 - hook failure == passthrough
        canonical = None
    cache = self._url_cache
    cache.insert(0, (url, canonical))
    del cache[4:]
    return canonical if canonical is not None else url


SGMLParser._put_url = _put_url
