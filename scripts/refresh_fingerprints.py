"""Refresh plans/fingerprints.json — the per-query definition-fingerprint
snapshot behind the rotation's changed-since-verification tier
(plans/registry.py, round-7 VERDICT "Next round" #1).

Run at ROUND START, before touching any code: at that moment the working
tree is exactly what the driver verified at the end of the previous
round, so associating the CURRENT fingerprint with each query's latest
green row is sound. Rules per registered query:

- no green driver row yet -> no snapshot entry (never tier covers it);
- existing entry whose recorded round >= the latest green round -> kept
  verbatim (nothing newer was verified; the entry may legitimately
  mismatch the current source, which is the whole signal);
- latest green round newer than the entry (or no entry) -> entry is
  (re)stamped with the current fingerprint at that round.

``--mark-changed name,...`` force-writes a non-matching sentinel for
queries KNOWN to have changed after their latest green row (used once,
bootstrapping r8: minhash_lsh_neardups / embedding_neardup_pairs were
reworked in r7 over r5 rows, so their current fingerprints must NOT be
blessed).

``--restamp`` rewrites the ``fp`` of every EXISTING entry with the
current fingerprint while keeping its recorded round. Only valid when
the fingerprint ALGORITHM changed but no query definition did (e.g. the
r9 walker fixes: function-local imports + deterministic const reprs) —
the snapshot entries are the same verified definitions, re-hashed.
Sentinel entries (``fp`` starting with ``changed-after-``) are kept
VERBATIM under --restamp (r9 ADVICE, medium): they flag definitions
known to postdate their green row, and overwriting them with the
current fingerprint would silently bless exactly what they exclude.

First-green-in-the-NEWEST-round queries get a SENTINEL, not a stamp
(r9 ADVICE, low): the dirty-tree check cannot tell whether HEAD moved
past the commit the driver verified (committed edits leave the tree
clean), so a query whose only green row is the newest round and which
has no prior snapshot entry cannot be soundly blessed — it is
sentineled into the changed tier and re-verified once more, after
which the normal stamping path takes over.

Soundness depends on the working tree matching what the driver verified,
so the script refuses to run when ``git status --porcelain`` shows
modifications, unless ``--force`` is given (r8 ADVICE, low). Each
stamped entry records the git HEAD sha for auditability.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_invoice_anomaly_detection_spark.plans import registry  # noqa: E402


def compute_snapshot(
    names: list[str],
    hist: dict[str, tuple[int, bool]],
    old: dict[str, dict],
    cur: dict[str, str],
    *,
    mark: set[str] = frozenset(),
    restamp: bool = False,
    head: str | None = None,
) -> tuple[dict[str, dict], dict[str, int]]:
    """Pure stamping decision (unit-tested in
    tests/test_verification_staleness.py): given the registry names, the
    driver history (name -> (latest_round, green)), the prior snapshot,
    and the current fingerprints, produce the new snapshot + stats."""
    newest_round = max(
        (rnd for rnd, ok in hist.values() if ok), default=0
    )
    snap: dict[str, dict] = {}
    stats = {"kept": 0, "stamped": 0, "sentinel": 0, "no_green": 0}

    def _stamp(fp: str, rnd: int) -> dict:
        entry = {"fp": fp, "round": rnd}
        if head:
            entry["sha"] = head
        return entry

    for name in names:
        latest_green = hist.get(name)
        if latest_green is None or not latest_green[1]:
            stats["no_green"] += 1
            continue
        rnd = latest_green[0]
        is_sentinel = str(old.get(name, {}).get("fp", "")).startswith(
            "changed-after-"
        )
        if name in mark:
            snap[name] = {"fp": f"changed-after-r{rnd}", "round": rnd}
            stats["sentinel"] += 1
        elif restamp and name in old:
            if is_sentinel and old[name].get("round", -1) >= rnd:
                # r9 ADVICE (medium): a sentinel marks a definition KNOWN
                # to postdate its green row — restamp re-hashes verified
                # definitions only, so the sentinel survives verbatim
                # until a newer green row clears it.
                snap[name] = old[name]
                stats["kept"] += 1
            else:
                # a CLEARED sentinel (newer green row arrived) re-stamps
                # at the new green round; plain entries keep their round
                keep_rnd = (
                    rnd if is_sentinel else old[name].get("round", rnd)
                )
                snap[name] = _stamp(cur[name], keep_rnd)
                stats["stamped"] += 1
        elif name in old and old[name].get("round", -1) >= rnd:
            snap[name] = old[name]
            stats["kept"] += 1
        elif name not in old and rnd == newest_round:
            # r9 ADVICE (low): first green row earned in the NEWEST round
            # on disk, no prior entry — the clean-tree check cannot prove
            # HEAD still equals the commit the driver verified (committed
            # edits leave the tree clean), so don't bless the current
            # fingerprint; sentinel it into the changed tier for one more
            # external verification.
            snap[name] = {"fp": f"changed-after-r{rnd}", "round": rnd}
            stats["sentinel"] += 1
        else:
            snap[name] = _stamp(cur[name], rnd)
            stats["stamped"] += 1
    return snap, stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mark-changed",
        default="",
        help="comma-separated query names to stamp with a non-matching "
        "sentinel fingerprint (definition known to postdate the green row)",
    )
    ap.add_argument(
        "--restamp",
        action="store_true",
        help="re-hash every existing entry with the current algorithm, "
        "keeping its round (fingerprint ALGORITHM changed, definitions "
        "did not)",
    )
    ap.add_argument(
        "--force",
        action="store_true",
        help="run despite a dirty working tree (normally refused: a "
        "mid-round run silently blesses unverified definitions)",
    )
    args = ap.parse_args()
    mark = {n for n in args.mark_changed.split(",") if n}

    import subprocess

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        dirty = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=repo_root, capture_output=True, text=True, timeout=30,
        ).stdout.strip()
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=repo_root, capture_output=True, text=True, timeout=30,
        ).stdout.strip() or None
    except (OSError, subprocess.SubprocessError):
        dirty, head = "", None
    if dirty and not args.force:
        raise SystemExit(
            "refusing: working tree has modifications (snapshot soundness "
            "requires the tree the driver verified). Re-run with --force "
            "if the dirt is provably outside query definitions:\n" + dirty
        )

    registry._load_all()
    unknown = mark - set(registry.REGISTRY)
    if unknown:
        raise SystemExit(f"--mark-changed names not in registry: {unknown}")

    cur = registry.current_fingerprints()
    old = registry.verified_fingerprints()
    hist = registry._DRIVER_HISTORY

    snap, stats = compute_snapshot(
        sorted(registry.REGISTRY), hist, old, cur,
        mark=mark, restamp=args.restamp, head=head,
    )

    path = registry._snapshot_path()
    with open(path, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.write("\n")
    changed = sorted(registry.changed_since_verification())
    print(f"wrote {path}: {stats}", file=sys.stderr)
    print(f"changed-tier now: {changed}", file=sys.stderr)


if __name__ == "__main__":
    main()
