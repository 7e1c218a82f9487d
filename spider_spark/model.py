"""Executable reference model — the parity oracle (SURVEY.md §5.2).

A ~100-line pure-Python model of the reference's frontier semantics
(A1 enqueue/first-wins dedup, A2 claim, A4 finish, A11 depth limit,
B6 retry budget), with the §2.H bugs deliberately NOT replicated:

- dedup key = raw, uncanonicalized URL string (mongo_redis_mgr.py:43-47);
- first-wins: a re-discovered URL keeps the depth/status of its first
  discovery, only the in-link counter increments (mongo_redis_mgr.py:44-46);
- claim order = discovery order (Mongo natural order ⇒ BFS;
  mongo_redis_mgr.py:31-40 has no sort clause — SURVEY.md §2.H.1);
- per-host budget mode: top-budget per host by (priority=depth, seq) —
  the engine's A2 mapping, asserted separately from BFS parity;
- fetch-miss retries up to MAX_PAGE_TRIED=2 (client_crawler.py:362), then
  status 'failed';
- robots verdict = RFC 9309 longest-match over Allow/Disallow patterns
  (robots.robots_denied — the same pure-python matcher the engine's JVM
  expression mirrors), evaluated at claim time, permanent.

The Spark engine must reproduce this model's final frontier, seen-set,
fetch-round assignment, link graph, and byte-identical extracted text.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from spider_spark import parse
from spider_spark.canon import host_of, normalize_href, url_md5

SEQ_ROUND_SHIFT = 40  # child seq = (round << 40) + rank — matches engine


@dataclass
class Entry:
    url: str
    depth: int
    status: str  # new | done | failed | denied
    discovered_round: int
    discovered_seq: int
    inlink_count: int = 1
    fetched_round: int | None = None
    attempt: int = 0

    @property
    def url_md5(self) -> str:
        return url_md5(self.url)


@dataclass
class ModelResult:
    frontier: dict[str, Entry]
    links: list[tuple[str, str, int]]  # (src, dst_normalized, pos)
    text: dict[str, str]               # url -> extracted text (byte-parity)
    rounds_run: int = 0

    @property
    def seen(self) -> set[str]:
        return set(self.frontier)


def run_model(
    pages: dict[str, bytes],
    seeds: list[str],
    max_depth: int = 10**9,
    max_rounds: int = 10**9,
    max_tries: int = 2,
    host_budget: int = -1,
    robots_deny: dict[str, list[str]] | None = None,
    robots_allow: dict[str, list[str]] | None = None,
) -> ModelResult:
    from spider_spark.robots import robots_denied

    frontier: dict[str, Entry] = {}
    links: list[tuple[str, str, int]] = []
    text: dict[str, str] = {}
    deny = robots_deny or {}
    allow = robots_allow or {}

    for i, url in enumerate(seeds):  # A10 seed injection, first-wins on dupes
        if url in frontier:
            frontier[url].inlink_count += 1
        else:
            frontier[url] = Entry(url, 0, "new", 0, i)

    rounds = 0
    for rnd in range(1, max_rounds + 1):
        pending = sorted(
            (e for e in frontier.values() if e.status == "new"),
            key=lambda e: e.discovered_seq,
        )
        if not pending:
            break
        rounds = rnd

        # robots deny (A13) — permanent, decided at claim time
        claimable = []
        for e in pending:
            host = host_of(e.url) or ""
            # path+query, fragment stripped — the SAME string the engine
            # matches (round.py's pathq). Splitting on the lowercased host
            # broke on uppercase hosts (no split → whole url) and left the
            # port in ( ':8080/admin' never prefix-matches '/admin').
            rest = e.url.split("://", 1)[-1]
            i = rest.find("/")
            path = (rest[i:] if i >= 0 else "/").split("#", 1)[0] or "/"
            if robots_denied(path, allow.get(host, []), deny.get(host, [])):
                e.status = "denied"
            else:
                claimable.append(e)

        # per-host budget pop (A2/A12); budget<0 = unlimited (parity/BFS mode)
        if host_budget >= 0:
            by_host: dict[str, list[Entry]] = {}
            for e in claimable:
                by_host.setdefault(host_of(e.url) or "", []).append(e)
            claimed = []
            for h in by_host.values():
                h.sort(key=lambda e: (e.depth, e.discovered_seq))
                claimed.extend(h[:host_budget])
            claimed.sort(key=lambda e: e.discovered_seq)
        else:
            claimed = claimable

        # fetch + extract + discover, in (parent_seq, pos) order
        discoveries: list[tuple[str, int]] = []  # (child_url, child_depth) in order
        for e in claimed:
            raw = pages.get(e.url)
            if raw is None:  # fetch miss → retry budget (B6)
                e.attempt += 1
                if e.attempt >= max_tries:
                    e.status = "failed"
                continue
            e.status = "done"  # A4 finishUrl
            e.fetched_round = rnd
            html = raw.decode("utf-8")
            text[e.url] = parse.extract_text(html) or ""
            for pos, href in enumerate(parse.extract_links(html)):
                dst = normalize_href(href)
                links.append((e.url, dst, pos))
                if e.depth + 1 <= max_depth:  # A11
                    discoveries.append((dst, e.depth + 1))

        # A1 enqueue: first-wins dedup on raw URL, inlink counter always bumps
        rank = 0
        for child, depth in discoveries:
            if child in frontier:
                frontier[child].inlink_count += 1
            else:
                frontier[child] = Entry(
                    child, depth, "new", rnd, (rnd << SEQ_ROUND_SHIFT) + rank
                )
                rank += 1

    return ModelResult(frontier=frontier, links=links, text=text, rounds_run=rounds)
