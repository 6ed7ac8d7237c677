"""Mechanical evidence staleness: query → defining file → rewrite round.

A driver-correctness row (CORRECTNESS_r{N}.json) proves Spark-vs-oracle
equality for the code path THAT EXISTED when the row was recorded. If a
query's implementation is rewritten later, the old row is stale evidence.
Until round 11 the cutoff lived in a hand-maintained dict
(``_REVERIFY_FROM_ROUND`` in ``__spark_entry__.py``) — the one place a
rewrite could silently keep counting stale evidence if the builder forgot
to add an entry (VERDICT r11 #1). This module derives the cutoff
mechanically:

- ``query_source_files()``: the registry holds each query's function
  object, so ``inspect`` gives its defining file.
- ``file_rewrite_rounds()``: one ``git log --name-only`` pass over the
  repo assigns every file the ROUND of the last commit touching it. Round
  boundaries are the driver's own marker commits (``round N: ...``) —
  commits after marker N belong to round N+1. CORRECTNESS_r{N} is
  recorded at the END of round N on the round-N tree, so a row from round
  N covers any change committed during round N, and a file last touched
  in round K needs a driver row from round >= K.
- Files dirty in the working tree (not yet committed) are assigned the
  CURRENT round (latest marker + 1): no existing row can vouch for
  uncommitted code.

Granularity is the DEFINING file: a touch anywhere in the file
invalidates every query defined in it (conservative — comment-only edits
force a re-verify), while a change to a shared helper module does NOT
invalidate its callers (the known limitation; the stalest-first refresh
rotation bounds how long such evidence can age regardless).

Consumed by ``__spark_entry__.py`` (rotation ordering) and
``tools/coverage.py`` (COVERAGE.md staleness appendix).
"""

from __future__ import annotations

import functools
import inspect
import os
import re
import subprocess

_MARKER_RE = re.compile(r"^round (\d+):")


def repo_root() -> str:
    # realpath, matching query_source_files(): a symlinked checkout path
    # must not make relpath produce keys that miss git's repo-relative
    # paths (the mechanism would silently no-op otherwise)
    return os.path.dirname(os.path.dirname(os.path.realpath(__file__)))


@functools.lru_cache(maxsize=1)
def query_source_files() -> dict[str, str]:
    """Registered query name → repo-relative path of its defining file."""
    from catenae_kafka_spark.registry import all_specs

    root = repo_root()
    out: dict[str, str] = {}
    for name, spec in all_specs().items():
        fn = inspect.unwrap(spec.fn)
        fn = getattr(fn, "func", fn)  # functools.partial
        try:
            src = inspect.getsourcefile(fn)
        except TypeError:
            src = None
        if src:
            out[name] = os.path.relpath(os.path.realpath(src), root)
    return out


def _git(root: str, *args: str) -> str:
    return subprocess.run(
        ["git", "-C", root, *args],
        check=True,
        capture_output=True,
        text=True,
        timeout=60,
    ).stdout


@functools.lru_cache(maxsize=1)
def file_rewrite_rounds() -> dict[str, int]:
    """Repo-relative path → round of the last commit touching it, with
    working-tree-dirty files bumped to the current (in-progress) round.

    Raises on any git failure — callers fall back to their static map
    rather than trusting a partial answer.
    """
    root = repo_root()
    # one pass over first-parent history, newest first: commits are
    # separated by \x01, each block is "HASH\tSUBJECT\n" + file list
    log = _git(root, "log", "--first-parent", "--name-only",
               "--format=%x01%H%x09%s")
    blocks = [b for b in log.split("\x01") if b.strip()]
    commits: list[tuple[str, list[str]]] = []
    for b in blocks:
        head, _, tail = b.partition("\n")
        subject = head.split("\t", 1)[1] if "\t" in head else ""
        files = [ln.strip() for ln in tail.splitlines() if ln.strip()]
        commits.append((subject, files))
    rounds: dict[str, int] = {}
    cur = 1
    for subject, files in reversed(commits):  # oldest → newest
        m = _MARKER_RE.match(subject)
        if m:
            # CORRECTNESS_rN is computed BEFORE the round-N marker
            # commit exists, so a file changed in the marker commit
            # itself is only vouched for by round >= N+1 rows — bump
            # before assigning the marker's own files
            cur = int(m.group(1)) + 1
        for f in files:
            rounds[f] = cur  # later (newer) commits overwrite
    status = _git(root, "status", "--porcelain")
    for ln in status.splitlines():
        # "XY path" or "XY old -> new" (renames)
        path = ln[3:].split(" -> ")[-1].strip().strip('"')
        if path:
            rounds[path] = cur
    return rounds


def reverify_rounds() -> dict[str, int]:
    """Query name → earliest driver round whose correctness row still
    counts as evidence for the CURRENT implementation (the round its
    defining file was last touched in).

    Raises if the query→file map and git's path universe don't overlap
    at all (path-normalization bug, foreign checkout): a silent empty
    result would disable the whole staleness mechanism while looking
    like success — callers must fall back loudly, not sag quietly."""
    files = file_rewrite_rounds()
    src = query_source_files()
    out = {q: files[path] for q, path in src.items() if path in files}
    if src and not out:
        raise RuntimeError(
            "no registered query's defining file matches any git-tracked "
            "path — path normalization broke; refusing to return an "
            "empty staleness map"
        )
    return out


def current_round() -> int:
    """The in-progress round number (latest driver marker + 1),
    derived from the same single cached history pass as
    file_rewrite_rounds()."""
    return max(_marker_rounds(), default=0) + 1


@functools.lru_cache(maxsize=1)
def _marker_rounds() -> tuple[int, ...]:
    log = _git(repo_root(), "log", "--first-parent", "--format=%s")
    return tuple(
        int(m.group(1))
        for subject in log.splitlines()
        if (m := _MARKER_RE.match(subject))
    )
