"""Unit tests for catenae_kafka_spark/evidence.py's git parsing against
a synthetic throwaway repository — the live-repo integration is covered
in tests/test_entry.py; these pin the round-boundary semantics
themselves (marker bumping, marker-commit file dating, dirty-file
dating, multi-touch overwrite) where the history can be controlled."""

from __future__ import annotations

import os
import subprocess


def _git(cwd, *args, env_extra=None):
    env = dict(os.environ)
    env.update(
        {
            "GIT_AUTHOR_NAME": "t",
            "GIT_AUTHOR_EMAIL": "t@t",
            "GIT_COMMITTER_NAME": "t",
            "GIT_COMMITTER_EMAIL": "t@t",
        }
    )
    if env_extra:
        env.update(env_extra)
    return subprocess.run(
        ["git", "-C", str(cwd), *args],
        check=True,
        capture_output=True,
        text=True,
        env=env,
    ).stdout


def _commit(cwd, msg, **files):
    for name, content in files.items():
        (cwd / name).write_text(content)
    _git(cwd, "add", "-A")
    _git(cwd, "commit", "-q", "-m", msg)


def _rounds_for(tmp_repo, monkeypatch):
    """file_rewrite_rounds() re-pointed at the synthetic repo."""
    import catenae_kafka_spark.evidence as ev

    monkeypatch.setattr(ev, "repo_root", lambda: str(tmp_repo))
    ev.file_rewrite_rounds.cache_clear()
    ev._marker_rounds.cache_clear()
    try:
        return dict(ev.file_rewrite_rounds())
    finally:
        ev.file_rewrite_rounds.cache_clear()
        ev._marker_rounds.cache_clear()


def test_round_boundaries_and_marker_commit_dating(tmp_path, monkeypatch):
    repo = tmp_path / "r"
    repo.mkdir()
    _git(repo, "init", "-q")
    # round 1 work
    _commit(repo, "add a", **{"a.py": "1"})
    _commit(repo, "add b", **{"b.py": "1"})
    # the round-1 marker commit ALSO touches a source file: that file's
    # rN row (recorded before this commit existed) must not vouch for
    # it -> dated round 2, while pure round-1 work stays round 1
    _commit(repo, "round 1: verdict/advice/correctness/bench",
            **{"CORRECTNESS_r01.json": "{}", "a.py": "2"})
    # round 2 work touches b
    _commit(repo, "fix b", **{"b.py": "2"})
    _commit(repo, "round 2: verdict/advice/correctness/bench",
            **{"CORRECTNESS_r02.json": "{}"})
    # round 3 (current) work touches c
    _commit(repo, "add c", **{"c.py": "1"})
    rounds = _rounds_for(repo, monkeypatch)
    assert rounds["a.py"] == 2  # marker-commit touch: N+1, not N
    assert rounds["b.py"] == 2  # last touched during round 2
    assert rounds["c.py"] == 3  # work after the last marker
    assert rounds["CORRECTNESS_r01.json"] == 2
    assert rounds["CORRECTNESS_r02.json"] == 3

    import catenae_kafka_spark.evidence as ev

    monkeypatch.setattr(ev, "repo_root", lambda: str(repo))
    ev._marker_rounds.cache_clear()
    try:
        assert ev.current_round() == 3
    finally:
        ev._marker_rounds.cache_clear()


def test_dirty_files_date_as_current_round(tmp_path, monkeypatch):
    repo = tmp_path / "r"
    repo.mkdir()
    _git(repo, "init", "-q")
    _commit(repo, "add a", **{"a.py": "1"})
    _commit(repo, "round 4: verdict/advice/correctness/bench",
            **{"CORRECTNESS_r04.json": "{}"})
    # modified-tracked AND untracked files are uncommitted: no driver
    # row can vouch for them -> current round (5)
    (repo / "a.py").write_text("dirty")
    (repo / "new.py").write_text("untracked")
    rounds = _rounds_for(repo, monkeypatch)
    assert rounds["a.py"] == 5
    assert rounds["new.py"] == 5


def test_rename_status_lines_use_new_path(tmp_path, monkeypatch):
    repo = tmp_path / "r"
    repo.mkdir()
    _git(repo, "init", "-q")
    _commit(repo, "add old", **{"old.py": "x" * 100})
    _commit(repo, "round 1: verdict/advice/correctness/bench",
            **{"CORRECTNESS_r01.json": "{}"})
    _git(repo, "mv", "old.py", "new.py")
    # staged rename: porcelain prints "R  old.py -> new.py"; the NEW
    # path is the one queries resolve to and must date as current
    rounds = _rounds_for(repo, monkeypatch)
    assert rounds["new.py"] == 2
