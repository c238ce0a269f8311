"""robots.txt parsing and matching per RFC 9309 (Robots Exclusion
Protocol), pure stdlib.

Crawl-pipeline role: the politeness gate on the URL frontier — before
fetching (or when auditing an existing crawl), every candidate URL is
checked against its host's robots rules.  Implemented from the public
RFC, not stdlib urllib.robotparser, because the RFC semantics differ
where it matters at crawl scale: longest-match precedence (§2.2.2),
``allow`` winning ties, ``*`` and ``$`` wildcards, group merging for
repeated user-agent lines, and percent-encoding-insensitive path
comparison.

Matching model:
* Groups: consecutive ``User-agent`` lines share the rules that
  follow (§2.2.1).  A product token matches case-insensitively; the
  most specific matching group wins (longest user-agent token), ``*``
  is the fallback group.  Multiple groups for the same agent merge.
* Rules: ``Allow``/``Disallow`` with path patterns; ``*`` matches any
  sequence, ``$`` anchors the end.  The rule with the LONGEST pattern
  wins; on equal length, allow beats disallow.  Empty ``Disallow:``
  means allow-all.
* Unknown directives are ignored; ``Sitemap:`` lines are surfaced
  (they feed the sitemap_parse operator).
"""

import re
from urllib.parse import unquote, urlsplit


class RobotsRules:
    """Parsed rules for ONE user-agent choice against one robots.txt."""

    __slots__ = ("rules", "crawl_delay")

    def __init__(self, rules, crawl_delay=None):
        # rules: list of (pattern, is_allow, pattern_len, compiled)
        self.rules = rules
        self.crawl_delay = crawl_delay

    def allowed(self, path_query):
        """RFC 9309 §2.2.2: longest-match wins; allow wins ties.
        ``path_query`` is the URL path (+ '?query' if any)."""
        best_len = -1
        best_allow = True
        target = _norm_path(path_query)
        for pat, is_allow, plen, rx in self.rules:
            if rx.match(target) and (plen > best_len or
                                     (plen == best_len and is_allow
                                      and not best_allow)):
                best_len = plen
                best_allow = is_allow
        return best_allow


def _norm_path(p):
    """Percent-decode unreserved-ish octets for comparison (the RFC
    compares octets; decoding BOTH pattern and path the same way is
    equivalent and simpler).  %2F must NOT decode (it would alias a
    path separator)."""
    if "%" not in p:
        return p
    return unquote(p.replace("%2F", "%252F").replace("%2f", "%252f"))


def _compile_pattern(pattern):
    """Robots pattern -> anchored regex: '*' -> '.*', trailing '$'
    anchors, everything else literal."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(_norm_path(seg)) for seg in pattern.split("*")]
    return re.compile(".*".join(parts) + ("$" if anchored else ""))


def parse_robots(text, user_agent="*"):
    """robots.txt content (str or bytes) -> (RobotsRules for
    ``user_agent``, sitemap list).  A missing/empty file allows all
    (RFC §2.3.1.2); an unparseable line is skipped, never fatal."""
    if isinstance(text, bytes):
        text = text.decode("utf-8", "replace")
    ua = user_agent.lower()
    groups = {}            # agent-token -> list of raw rules
    sitemaps = []
    crawl_delays = {}
    cur_agents = []
    last_was_ua = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            agent = val.lower()
            if not last_was_ua:
                cur_agents = []
            cur_agents.append(agent)
            groups.setdefault(agent, [])
            last_was_ua = True
            continue
        last_was_ua = False
        if key == "sitemap":
            if val:
                sitemaps.append(val)
            continue
        if key in ("allow", "disallow"):
            if not cur_agents:
                continue          # rule before any group: ignored
            if key == "disallow" and not val:
                continue          # empty Disallow == allow all
            if not val:
                continue
            for a in cur_agents:
                groups[a].append((val, key == "allow"))
        elif key == "crawl-delay":
            try:
                d = float(val)
            except ValueError:
                continue
            for a in cur_agents:
                crawl_delays[a] = d

    # most specific matching group: longest agent token contained in
    # the requested UA; '*' as fallback (RFC §2.2.1)
    chosen = None
    if ua != "*":
        matches = [a for a in groups
                   if a != "*" and (a in ua or ua in a)]
        if matches:
            chosen = max(matches, key=len)
    if chosen is None:
        chosen = "*" if "*" in groups else None
    raw_rules = groups.get(chosen, [])
    rules = [(pat, is_allow, len(pat), _compile_pattern(pat))
             for pat, is_allow in raw_rules]
    return (RobotsRules(rules, crawl_delays.get(chosen)), sitemaps)


def url_allowed(rules: RobotsRules, url):
    """Convenience: full URL -> allowed? (path+query extracted here;
    scheme/host are the caller's grouping key)."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return False
    pq = parts.path or "/"
    if parts.query:
        pq += "?" + parts.query
    return rules.allowed(pq)
