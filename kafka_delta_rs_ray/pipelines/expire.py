"""Snapshot expire: reachability GC over manifest versions.

Retain the newest ``keep_last`` versions (the latest always survives);
every data/delete file referenced by ANY retained manifest is
reachable; everything else in data/ and deletes/ — including orphans
from crashed or conflict-losing runs — is swept, and expired manifest
files are removed. Retained versions keep full snapshot isolation:
their entire file closure stays on disk.

Safety valve for concurrency: files younger than ``min_age_seconds``
are kept even if unreferenced, because an in-flight run writes
fragments BEFORE its manifest CAS makes them reachable (the
write-then-commit ordering, reference src/kafka/mod.rs:187-231).
Driver-side metadata walk only — no Ray work.
"""

from __future__ import annotations

import os
import time

from ..state.lineage import RunContext
from ..tablefmt.catalog import Table


def expire(table: Table, keep_last: int = 2,
           min_age_seconds: float = 3600.0,
           run_id: str | None = None, dry_run: bool = False) -> dict:
    """``min_age_seconds`` defaults to one hour so the safety valve is
    ON by default: an in-flight run's pre-commit files (unreferenced
    until its manifest CAS) are never swept by a concurrent expire.
    Pass an explicit 0 only when no other writer can be running (tests,
    single-process lifecycle scripts)."""
    ctx = RunContext(table.root, run_id, job="expire")
    t0 = time.time()
    from ..tablefmt.manifest import SHARD_PREFIX

    # The whole [read tags → compute reachable → sweep files → unlink
    # manifests] section runs under the shared gc lock, serializing
    # against tag() publication: a tag either lands before our tags()
    # read (its closure is retained in full) or after our sweep (tag()
    # verifies the full closure post-publish and withdraws itself).
    # Without the lock there is an unfixable TOCTOU window where a tag
    # published mid-sweep passes its check and then loses its data
    # files. Lock hold time = one driver-side metadata walk.
    with table.gc_lock():
        versions = table.versions()
        keep_last = max(1, keep_last)
        # tagged versions are pinned: their full closure survives any
        # keep_last (the named-ref contract; delete_tag releases them)
        tagged = set(table.tags().values()) & set(versions)
        retained = sorted(set(versions[-keep_last:]) | tagged)
        expired_versions = [v for v in versions
                            if v not in set(retained)]

        reachable: set[str] = set()
        for v in retained:
            m = table.read_manifest(v)
            for f in m.fragments:
                reachable.add(f.path)
                reachable.update(f.delete_paths)
            # sharded manifests (format v2): the retained version's
            # fragment-list shard files are part of its closure
            reachable.update(m.shard_paths())

        # other lines (branches when expiring main; main + sibling
        # branches when expiring a branch) are live writable refs:
        # their ENTIRE closure stays reachable — only delete_branch
        # releases a line. Without this, expiring main would sweep
        # data/shard files that only a branch still references.
        main = Table(table.root) if table.is_branch else table
        other_lines = [main] if table.is_branch else []
        other_lines += [main.branch(b) for b in main.branches()
                        if not (table.is_branch
                                and b == table.branch_name)]
        for line in other_lines:
            for v in line.versions():
                m = line.read_manifest(v)
                for f in m.fragments:
                    reachable.add(f.path)
                    reachable.update(f.delete_paths)
                reachable.update(m.shard_paths())

        removed_files: list[str] = []
        kept_young = 0
        now = time.time()
        for sub in ("data", "deletes", "manifest"):
            d = os.path.join(table.root, sub)
            for name in sorted(os.listdir(d)):
                if sub == "manifest" and not name.startswith(SHARD_PREFIX):
                    continue  # version docs handled below, temps skipped
                rel = os.path.join(sub, name)
                if rel in reachable:
                    continue
                full = os.path.join(d, name)
                if now - os.path.getmtime(full) < min_age_seconds:
                    kept_young += 1
                    continue  # maybe an in-flight run's pre-commit file
                if not dry_run:
                    os.unlink(full)
                removed_files.append(rel)

        for v in expired_versions:
            if not dry_run:
                os.unlink(table.manifest_path(v))

    report = {
        "retained_versions": retained,
        "expired_versions": expired_versions,
        "removed_files": removed_files,
        "kept_young_files": kept_young,
        "dry_run": dry_run,
        "seconds": time.time() - t0,
    }
    ctx.log_metric("expire_done", **{k: (len(v) if isinstance(v, list) else v)
                                     for k, v in report.items()})
    return report
