"""robots.txt parsing — the text → rules step in front of the fetch
scheduler's gate.

Reference: protocol/RobotRulesParser.java delegates to crawler-commons
SimpleRobotRulesParser; HttpRobotRulesParser adds the HTTP status
handling (403 ⇒ forbid-all unless http.robots.403.allow, 5xx ⇒
allow-all) which operators/fetch.py already applies per host. This
module covers the content grammar with crawler-commons' matching
semantics:

  * directives are case-insensitive; `#` starts a comment;
  * `User-agent:` lines open a group (consecutive agent lines share
    it); a group matches if the configured robot name is a SUBSTRING
    of the group's agent token (lowercased) — crawler-commons'
    `userAgent.contains(robotName)`; `*` matches everyone; a named
    match beats `*`;
  * `Allow:` / `Disallow:` path prefixes — the LONGEST matching rule
    decides, Allow winning ties (Google/crawler-commons precedence,
    not first-match); an empty Disallow allows everything;
  * `Crawl-delay:` seconds (float) per group.

Output is the plain-dict rule shape `operators/fetch.py` consumes
(broadcast per-host), with an `allow` list extending the round-1
`disallow`-only shape.
"""

from __future__ import annotations


def parse_robots_txt(
    text: str | None, agent: str = "nutch", http_code: int = 200
) -> dict:
    """robots.txt content → rules dict for one host.

    Returns ``{"disallow": [...], "allow": [...], "crawl_delay":
    float | None, "http_code": int}``.
    """
    rules: dict = {
        "disallow": [],
        "allow": [],
        "crawl_delay": None,
        "http_code": http_code,
    }
    if not text:
        return rules
    agent = agent.lower()

    # collect groups: (agent_tokens, directives)
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, str]] = []
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run and cur_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(val.lower())
            in_agent_run = True
        elif key in ("disallow", "allow", "crawl-delay"):
            in_agent_run = False
            if cur_agents:
                cur_rules.append((key, val))
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    # pick the most specific matching group: named substring match
    # beats '*'; first such group wins (crawler-commons precedence)
    chosen: list[tuple[str, str]] | None = None
    wildcard: list[tuple[str, str]] | None = None
    for agents, directives in groups:
        if any(a != "*" and agent in a for a in agents) and chosen is None:
            chosen = directives
        if "*" in agents and wildcard is None:
            wildcard = directives
    directives = chosen if chosen is not None else wildcard
    if directives is None:
        return rules

    for key, val in directives:
        if key == "disallow":
            if val:  # empty Disallow: allow all (no rule)
                rules["disallow"].append(val)
        elif key == "allow":
            if val:
                rules["allow"].append(val)
        elif key == "crawl-delay":
            try:
                rules["crawl_delay"] = float(val)
            except ValueError:
                pass
    return rules


def robots_allows(rules: dict | None, path: str,
                  allow_forbidden: bool = False) -> bool:
    """Longest-match Allow/Disallow decision + the HTTP status rules
    (HttpRobotRulesParser.java:137-147). Used by operators/fetch.py."""
    if rules is None:
        return True
    code = rules.get("http_code", 200)
    if code >= 500:
        return True  # 5xx ⇒ allow-all, uncached
    if code == 403 and not allow_forbidden:
        return False  # forbid-all
    best_len = -1
    best_allow = True  # no rule matches ⇒ allowed
    for prefix in rules.get("disallow") or ():
        if path.startswith(prefix) and len(prefix) > best_len:
            best_len, best_allow = len(prefix), False
    for prefix in rules.get("allow") or ():
        # ties go to Allow: >= on equal length
        if path.startswith(prefix) and len(prefix) >= best_len:
            best_len, best_allow = len(prefix), True
    return best_allow
