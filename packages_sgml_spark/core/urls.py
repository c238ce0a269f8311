"""URL resolution + canonicalization for the link-graph operators
(pure stdlib, RFC 3986 semantics).

A crawl pipeline keys host graphs, frontier dedup and
contamination lists on the CANONICAL form of a URL; the rules here
are the widely-shared subset (RFC 3986 §6.2.2 syntax-based
normalization + the scheme-based default-port rule) that is safe —
every transform maps a URL to one that dereferences identically:

* scheme + host lowercased; trailing ``.`` of the host dropped
* default ports stripped (http:80, https:443, ftp:21)
* percent-encoding: hex uppercased, unreserved characters decoded
* dot-segments removed (§5.2.4)
* empty path -> ``/`` when there is an authority
* fragment dropped (never sent to the server)

Query strings are NOT re-ordered and ``www.`` is NOT stripped — both
change server-visible semantics and belong in site-specific policy,
not a canonicalizer.
"""

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80",
                 "wss": "443"}

_RE_PCT = re.compile(r"%([0-9a-fA-F]{2})")
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    "0123456789-._~")


def _pct_normalize(s):
    """Uppercase %XX hex; decode unreserved octets (§2.3/§6.2.2.2)."""
    def repl(m):
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()
    return _RE_PCT.sub(repl, s)


def remove_dot_segments(path):
    """RFC 3986 §5.2.4."""
    out = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = path[2:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = path[3:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1)
            if i < 0:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


def canonical_url(url):
    """Canonical form of an absolute URL (see module docstring).
    Returns None for inputs that do not parse as an absolute
    hierarchical URL (no scheme or no host) — callers treat those as
    non-links (javascript:, mailto:, data: and friends)."""
    if url is None:
        return None
    url = url.strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if not scheme or not parts.netloc:
        return None
    host = (parts.hostname or "").lower().rstrip(".")
    if not host:
        return None
    userinfo = ""
    if parts.username:
        userinfo = parts.username
        if parts.password is not None:
            userinfo += ":" + parts.password
        userinfo += "@"
    try:
        port = parts.port
    except ValueError:
        port = None
    netloc = userinfo + host
    if port is not None and str(port) != DEFAULT_PORTS.get(scheme):
        netloc += ":%d" % port
    path = _pct_normalize(remove_dot_segments(parts.path))
    if not path:
        path = "/"
    query = _pct_normalize(parts.query)
    return urlunsplit((scheme, netloc, path, query, ""))


def resolve_url(base, href):
    """Resolve ``href`` against ``base`` (RFC 3986 §5, stdlib
    urljoin) and canonicalize; None for non-http(s)-like results and
    unparseable inputs."""
    if href is None:
        return None
    href = href.strip()
    if not href:
        return None
    low = href[:11].lower()
    if low.startswith(("javascript:", "mailto:", "data:", "tel:",
                       "about:")):
        return None
    try:
        return canonical_url(urljoin(base or "", href))
    except ValueError:
        return None


def url_host(url):
    """Lowercased host of an absolute URL (None if not parseable) —
    the Python mirror of the JVM-side parse_url(url, 'HOST')."""
    try:
        h = urlsplit(url).hostname
    except ValueError:
        return None
    return h.lower().rstrip(".") if h else None
