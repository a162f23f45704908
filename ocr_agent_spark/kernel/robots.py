"""robots.txt parsing + RFC 9309 rule matching (pure stdlib).

A crawl pipeline's politeness gate: before fetching (or when auditing
an existing crawl), every URL is checked against its host's robots.txt.
This kernel implements the Robots Exclusion Protocol as specified by
RFC 9309 and the major crawlers' documented behavior:

- group selection: the most specific ``User-agent`` match wins (exact
  product token beats ``*``); multiple agent lines stack onto one group
- rule matching: ``*`` matches any char run, ``$`` anchors the end;
  percent-encoding is compared as-is (case-sensitive paths)
- precedence: the LONGEST matching pattern wins; on equal length an
  ``allow`` beats a ``disallow`` (Google/Bing documented tie-break)
- empty ``Disallow:`` = allow all; missing/unparseable file = allow all

The Spark half lives in ``functions/robots.py``: rules parse once per
host (tiny), broadcast-join against the url table, and the longest-
match argmax runs as a JVM aggregation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class RobotsRule:
    pattern: str
    allow: bool

    @property
    def specificity(self) -> int:
        return len(self.pattern)


def _agent_matches(agent_line: str, user_agent: str) -> int:
    """Specificity of an agent-line match: 0 = no match, 1 = wildcard,
    else 1 + len(token) so the LONGEST matching product token wins —
    RFC 9309 §2.2.1: "googlebot-news" must beat "googlebot" for that
    agent, not merge with it (code-review r4c, reproduced)."""
    token = agent_line.strip().lower()
    ua = user_agent.strip().lower()
    if token == "*":
        return 1
    if token and (ua == token or ua.startswith(token)):
        return 1 + len(token)
    return 0


def parse_robots(content: str, user_agent: str = "*") -> list[RobotsRule]:
    """robots.txt text → the rule list of the group governing
    ``user_agent`` (empty list = everything allowed)."""
    groups: list[tuple[int, list[RobotsRule]]] = []
    cur_spec = 0
    cur_rules: list[RobotsRule] | None = None
    in_agent_run = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                # a new group starts: flush the previous one
                if cur_rules is not None:
                    groups.append((cur_spec, cur_rules))
                cur_spec, cur_rules = 0, []
                in_agent_run = True
            cur_spec = max(cur_spec, _agent_matches(value, user_agent))
        elif field in ("allow", "disallow"):
            in_agent_run = False
            if cur_rules is None:
                continue  # rules before any User-agent line: ignored
            if value == "":
                continue  # empty Allow/Disallow carries no rule
            cur_rules.append(RobotsRule(value, field == "allow"))
        else:
            in_agent_run = False  # crawl-delay/sitemap/etc end the run
    if cur_rules is not None:
        groups.append((cur_spec, cur_rules))
    # most specific matching group wins; among equals, rules merge
    # (RFC 9309: multiple groups for the same agent are combined)
    best = max((spec for spec, _ in groups), default=0)
    if best == 0:
        return []
    merged: list[RobotsRule] = []
    for spec, rules in groups:
        if spec == best:
            merged.extend(rules)
    return merged


def crawl_delay(content: str, user_agent: str = "*") -> float | None:
    """``Crawl-delay`` of the group governing ``user_agent``.

    Not in RFC 9309 but ubiquitous in the wild (Bing/Yandex honor it;
    Google ignores it). Group selection mirrors :func:`parse_robots`
    (most specific agent match wins); among equal-specificity groups
    the LARGEST delay wins — the politeness-conservative merge. Returns
    seconds as float, or None when absent/invalid (non-numeric,
    negative).
    """
    groups: list[tuple[int, float | None]] = []
    cur_spec = 0
    cur_delay: float | None = None
    cur_open = False
    in_agent_run = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                if cur_open:
                    groups.append((cur_spec, cur_delay))
                cur_spec, cur_delay, cur_open = 0, None, True
                in_agent_run = True
            cur_spec = max(cur_spec, _agent_matches(value, user_agent))
        else:
            in_agent_run = False
            if field == "crawl-delay" and cur_open:
                try:
                    d = float(value)
                except ValueError:
                    continue
                if d >= 0:
                    cur_delay = d if cur_delay is None else max(cur_delay, d)
    if cur_open:
        groups.append((cur_spec, cur_delay))
    best = max((spec for spec, _ in groups), default=0)
    if best == 0:
        return None
    delays = [d for spec, d in groups if spec == best and d is not None]
    return max(delays) if delays else None


def sitemap_urls(content: str) -> list[str]:
    """``Sitemap:`` directives of a robots.txt (RFC 9309 §2.2.4 treats
    them as non-group lines valid anywhere in the file) — the hook that
    connects the politeness gate to sitemap frontier discovery."""
    out: list[str] = []
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap":
            value = value.strip()
            if value and value not in out:
                out.append(value)
    return out


def _compile_pattern(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return re.compile(rx + ("$" if anchored else ""))


def rule_matches(pattern: str, path: str) -> bool:
    """Does ``pattern`` (with ``*``/``$``) match ``path`` at the start?"""
    if "*" not in pattern and "$" not in pattern:
        return path.startswith(pattern)
    return _compile_pattern(pattern).match(path) is not None


def is_allowed(rules: list[RobotsRule], path: str) -> bool:
    """RFC 9309 evaluation: longest matching pattern wins; allow wins
    length ties; no match = allowed."""
    best: RobotsRule | None = None
    for rule in rules:
        if not rule_matches(rule.pattern, path):
            continue
        if (best is None or rule.specificity > best.specificity
                or (rule.specificity == best.specificity and rule.allow)):
            best = rule
    return True if best is None else best.allow


def pattern_to_java_regex(pattern: str) -> str:
    """Pattern → an RE2/Java-portable anchored regex for JVM rlike —
    the engine-side form of :func:`rule_matches` for wildcard rules."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = ["^"]
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in r"\.[]{}()<>*+-=!?^$|":
            out.append("\\" + ch)
        else:
            out.append(ch)
    if anchored:
        out.append("$")
    return "".join(out)
