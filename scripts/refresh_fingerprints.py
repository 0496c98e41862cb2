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

    snap: dict[str, dict] = {}
    stats = {"kept": 0, "stamped": 0, "sentinel": 0, "no_green": 0}
    for name in sorted(registry.REGISTRY):
        latest_green = hist.get(name)
        if latest_green is None or not latest_green[1]:
            stats["no_green"] += 1
            continue
        rnd = latest_green[0]
        if name in mark:
            snap[name] = {"fp": f"changed-after-r{rnd}", "round": rnd}
            stats["sentinel"] += 1
        elif args.restamp and name in old:
            entry = {"fp": cur[name], "round": old[name].get("round", rnd)}
            if head:
                entry["sha"] = head
            snap[name] = entry
            stats["stamped"] += 1
        elif name in old and old[name].get("round", -1) >= rnd:
            snap[name] = old[name]
            stats["kept"] += 1
        else:
            entry = {"fp": cur[name], "round": rnd}
            if head:
                entry["sha"] = head
            snap[name] = entry
            stats["stamped"] += 1

    path = registry._snapshot_path()
    with open(path, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.write("\n")
    changed = sorted(registry.changed_since_verification())
    print(f"wrote {path}: {stats}", file=sys.stderr)
    print(f"changed-tier now: {changed}", file=sys.stderr)


if __name__ == "__main__":
    main()
