"""Table catalog: open/create tables, atomic versioned commits.

Commit protocol (the port of the reference's exactly-once recipe,
src/kafka/mod.rs:182-231 — [write data → commit table → commit
offsets] with bounded retry):

1. all data files (fragments, delete files) are fully written first;
2. the new manifest JSON is written to a temp file and published with
   ``os.link`` → creating ``manifest/v{N+1}.json`` is an atomic
   compare-and-swap: it FAILS if another writer committed N+1 first;
3. on CAS failure the builder callback is re-run against the fresh
   latest manifest (optimistic concurrency) up to ``max_attempts``
   times — the reference's 3×5s offset-commit retry
   (src/kafka/mod.rs:192-228) without the sleep (losers see the new
   manifest immediately on a filesystem).

Readers resolve ``latest`` as max version present; a version file is
only ever complete (link is atomic), so every read is a consistent
snapshot — snapshot isolation falls out of immutability.
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid
from collections.abc import Callable

import pyarrow as pa

from ..errors import CommitConflict, StateError
from .manifest import MANIFEST_FMT, Fragment, Manifest
from .snapshot import Snapshot

_DIRS = ("data", "deletes", "manifest", "quarantine", "_runs")


class Table:
    """Handle to a table root directory. Cheap to construct; stateless
    between calls (all state lives in the manifest files)."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        if not os.path.isdir(self._manifest_dir()):
            raise StateError(f"not a table: {root} (no manifest dir)")

    # -- creation ----------------------------------------------------------
    @classmethod
    def create(cls, root: str, schema: pa.Schema,
               properties: dict | None = None,
               constraints: list | None = None) -> "Table":
        """``constraints``: declarative CHECK constraints (see
        stages/constraints.py) enforced by every write path —
        violating rows dead-letter to quarantine/."""
        from ..stages.constraints import normalize_constraints

        root = os.path.abspath(root)
        for d in _DIRS:
            os.makedirs(os.path.join(root, d), exist_ok=True)
        t = cls.__new__(cls)
        t.root = root
        props = dict(properties or {})
        if constraints:
            props["constraints"] = normalize_constraints(constraints,
                                                         schema=schema)
        m = Manifest(version=0, parent=None, kind="create", schema=schema,
                     properties=props)
        t._publish(m)
        return t

    # -- CHECK constraints (write-time row contracts) ----------------------
    def constraints(self) -> list[dict]:
        return list(self.read_manifest().properties.get("constraints", []))

    def add_constraint(self, constraint: dict) -> "Manifest":
        """Publish a new CHECK constraint as a property-only commit
        (kind='alter'). Applies to FUTURE writes only — existing rows
        are not re-validated (Delta's ADD CONSTRAINT requires a table
        scan; our contract is explicit instead of implicit)."""
        from ..stages.constraints import normalize_constraints

        def build(latest: Manifest) -> Manifest:
            cur = list(latest.properties.get("constraints", []))
            merged = normalize_constraints(cur + [constraint],
                                           schema=latest.schema)
            return Manifest(version=-1, parent=None, kind="alter",
                            schema=latest.schema,
                            fragments=list(latest.fragments),
                            txn={k: dict(v) for k, v in latest.txn.items()},
                            properties={**latest.properties,
                                        "constraints": merged})

        return self.commit(build)

    def drop_column(self, name: str) -> "Manifest":
        """ALTER TABLE DROP COLUMN as a METADATA-ONLY commit (Delta's
        column-mapping drop): the field leaves the schema in one
        kind='alter' commit; fragment files are untouched (their
        physical column becomes invisible — ``conform_table`` projects
        every read onto the manifest schema once ``schema_evolved``
        is set, the same machinery merge_schema adds rely on). Space
        is reclaimed lazily: the next compaction rewrites fragments
        to the current schema. Dropping the key column, a column a
        CHECK constraint references, or the last data column is
        rejected at declaration (validate-early, C1 posture)."""
        if name == "image_id":
            raise StateError("cannot drop the key column 'image_id'")

        def build(latest: Manifest) -> Manifest:
            if name not in latest.schema.names:
                raise StateError(f"no such column {name!r}")
            if len(latest.schema) <= 2:
                raise StateError("cannot drop the last data column")
            used = [c["name"] for c in
                    latest.properties.get("constraints", [])
                    if c["col"] == name]
            if used:
                raise StateError(
                    f"column {name!r} is referenced by constraint(s) "
                    f"{used}; drop them first")
            fields = [f for f in latest.schema if f.name != name]
            return Manifest(
                version=-1, parent=None, kind="alter",
                schema=pa.schema(fields),
                fragments=list(latest.fragments),
                txn={k: dict(v) for k, v in latest.txn.items()},
                properties={**latest.properties,
                            "schema_evolved": True})

        return self.commit(build)

    def drop_constraint(self, name: str) -> "Manifest":
        def build(latest: Manifest) -> Manifest:
            cur = list(latest.properties.get("constraints", []))
            kept = [c for c in cur if c["name"] != name]
            if len(kept) == len(cur):
                raise StateError(f"no such constraint {name!r}")
            props = {**latest.properties, "constraints": kept}
            if not kept:
                props.pop("constraints")
            return Manifest(version=-1, parent=None, kind="alter",
                            schema=latest.schema,
                            fragments=list(latest.fragments),
                            txn={k: dict(v) for k, v in latest.txn.items()},
                            properties=props)

        return self.commit(build)

    # -- paths -------------------------------------------------------------
    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "manifest")

    def manifest_path(self, version: int) -> str:
        return os.path.join(self._manifest_dir(), MANIFEST_FMT.format(version))

    def abspath(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    # -- reads -------------------------------------------------------------
    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self._manifest_dir()):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def history(self) -> list[dict]:
        """Commit history, newest first (DESCRIBE HISTORY analog):
        one row per retained version with kind, counts and the manifest
        file's mtime. Reads only the version documents — the summary
        block answers fragment/row counts without loading fragment-list
        shards (older manifests without a summary fall back to a full
        load)."""
        import json as _json

        out = []
        for v in reversed(self.versions()):
            with open(self.manifest_path(v)) as f:
                d = _json.load(f)
            s = d.get("summary")
            if s is None:  # pre-summary manifest: full load
                m = self.read_manifest(v)
                s = {"fragments": len(m.fragments),
                     "rows": int(m.total_rows())}
            out.append({
                "version": v,
                "parent": d["parent"],
                "kind": d["kind"],
                "fragments": s["fragments"],
                "rows": s["rows"],
                "apps": sorted(d["txn"]),
                "committed_at": os.path.getmtime(self.manifest_path(v)),
            })
        return out

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise StateError(f"table {self.root} has no manifest versions")
        return vs[-1]

    def read_manifest(self, version: int | None = None) -> Manifest:
        v = self.latest_version() if version is None else version
        with open(self.manifest_path(v)) as f:
            return Manifest.from_json_str(f.read(), root=self.root)

    def version_as_of(self, ts: float) -> int:
        """Latest version committed at or before unix-time ``ts``
        (timestamp time travel; commit time = the manifest file's
        mtime, set atomically by the CAS link)."""
        best = None
        for v in self.versions():
            if os.path.getmtime(self.manifest_path(v)) <= ts:
                best = v
        if best is None:
            raise StateError(
                f"no version committed at or before {ts} "
                f"(earliest is {self.versions()[0]})")
        return best

    # -- tags (named version refs; expire keeps tagged closures) -----------
    def _tags_dir(self) -> str:
        return os.path.join(self._manifest_dir(), "tags")

    def gc_lock(self):
        """Advisory exclusive lock serializing ``tag()`` publication
        against ``expire()``'s sweep. Without it the two sides race:
        a tag published after expire read tags() but before its file
        sweep finishes can pin a version whose data files were already
        unlinked (a silently broken pinned snapshot). flock gives true
        mutual exclusion on a shared filesystem; on an object store
        the catalog's conditional-put would play this role. Held for
        the duration of expire (driver-side metadata walk — cheap) and
        of a tag publish+verify."""
        import contextlib
        import fcntl

        @contextlib.contextmanager
        def _lock():
            # always the MAIN line's lock file, so branch handles and
            # the main handle serialize against the same GC
            path = os.path.join(self.root, "manifest", ".gc.lock")
            with open(path, "w") as f:
                fcntl.flock(f, fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(f, fcntl.LOCK_UN)

        return _lock()

    def _closure_paths(self, version: int) -> list[str]:
        """Every file (relative path) a version's snapshot needs:
        fragments, delete files, and fragment-list shards."""
        m = self.read_manifest(version)
        out: list[str] = []
        for f in m.fragments:
            out.append(f.path)
            out.extend(f.delete_paths)
        out.extend(m.shard_paths())
        return out

    def tag(self, name: str, version: int | None = None) -> int:
        """Pin ``name`` to a version (default latest). Creation is an
        atomic O_EXCL write — tags are immutable refs; re-pointing a
        name is ``delete_tag`` + ``tag`` (two deliberate steps, like
        the manifest CAS, so nothing ever mutates in place). A tagged
        version's FULL file closure survives ``expire`` regardless of
        ``keep_last``."""
        import json as _json
        import re as _re

        if not _re.fullmatch(r"[A-Za-z0-9._-]{1,64}", name):
            raise ValueError(f"bad tag name {name!r} "
                             f"(allowed: [A-Za-z0-9._-], max 64)")
        v = self.latest_version() if version is None else int(version)
        if not os.path.exists(self.manifest_path(v)):
            raise StateError(f"cannot tag missing version {v}")
        os.makedirs(self._tags_dir(), exist_ok=True)
        path = os.path.join(self._tags_dir(), f"{name}.json")
        # tag-vs-expire race: publish + closure verification run under
        # the shared gc lock, so they serialize against expire's
        # [tags read → sweep] section. Either this tag lands before
        # expire reads tags (the whole closure is retained) or after
        # expire's sweep (the closure check below sees the damage and
        # the tag withdraws itself) — never half-pinned.
        with self.gc_lock():
            # same temp-write + hard-link publish as the manifest CAS:
            # readers never observe a partial file, and a crash
            # mid-write leaves only an orphan temp, never a corrupt tag
            fd, tmp = tempfile.mkstemp(dir=self._tags_dir(),
                                       suffix=".tmp")
            try:
                with os.fdopen(fd, "w") as f:
                    f.write(_json.dumps({"name": name, "version": v,
                                         "created_at": time.time()}))
                try:
                    os.link(tmp, path)
                except FileExistsError:
                    raise FileExistsError(
                        f"tag {name!r} already exists (tags are "
                        f"immutable refs; delete_tag first)") from None
            finally:
                os.unlink(tmp)
            # verify the version's FULL file closure (manifest +
            # fragments + delete files + shards) after publishing: a
            # concurrent expire that already swept any of it loses the
            # tag, never leaving a pinned-but-broken snapshot
            missing = None
            if not os.path.exists(self.manifest_path(v)):
                missing = f"manifest v{v}"
            else:
                for rel in self._closure_paths(v):
                    if not os.path.exists(self.abspath(rel)):
                        missing = rel
                        break
            if missing is not None:
                os.unlink(path)
                raise StateError(
                    f"version {v} was expired while tagging "
                    f"(missing {missing}); re-run against a retained "
                    f"version")
        return v

    def tags(self) -> dict:
        """name -> version for every tag."""
        import json as _json

        d = self._tags_dir()
        if not os.path.isdir(d):
            return {}
        out = {}
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    doc = _json.load(f)
                out[doc["name"]] = int(doc["version"])
        return out

    def delete_tag(self, name: str) -> None:
        path = os.path.join(self._tags_dir(), f"{name}.json")
        if not os.path.exists(path):
            raise StateError(f"no such tag {name!r}")
        os.unlink(path)

    # -- branches (named WRITABLE refs; Iceberg-style) ----------------------
    is_branch = False

    def _branches_dir(self) -> str:
        # branches always hang off the MAIN manifest dir, even when
        # called through a branch handle (no nested branches)
        return os.path.join(self.root, "manifest", "branches")

    def branches(self) -> list[str]:
        d = self._branches_dir()
        if not os.path.isdir(d):
            return []
        return sorted(n for n in os.listdir(d)
                      if os.path.isdir(os.path.join(d, n)))

    def create_branch(self, name: str,
                      version: int | None = None) -> "BranchTable":
        """Fork a writable line from ``version`` (default latest).

        A branch is its own manifest sequence under
        ``manifest/branches/<name>/`` sharing the table's data files:
        the seed manifest is a HARD LINK of the base version's doc
        (zero copy, shared shard files — all file paths are
        root-relative), and every pipeline (append/merge/compact/
        cluster) works on the branch handle unchanged because the
        whole engine resolves state through ``_manifest_dir()``.
        Commits on a branch never touch the main line; ``expire`` on
        any line retains every OTHER line's full closure. Publication
        is atomic (temp dir + rename), so readers never observe a
        half-created branch."""
        import re as _re
        import shutil

        if self.is_branch:
            raise StateError("nested branches are not supported; "
                             "branch from the main table")
        if not _re.fullmatch(r"[A-Za-z0-9._-]{1,64}", name):
            raise ValueError(f"bad branch name {name!r} "
                             f"(allowed: [A-Za-z0-9._-], max 64)")
        v = self.latest_version() if version is None else int(version)
        if not os.path.exists(self.manifest_path(v)):
            raise StateError(f"cannot branch from missing version {v}")
        import json as _json

        bdir = os.path.join(self._branches_dir(), name)
        if os.path.isdir(bdir):
            raise StateError(f"branch {name!r} already exists")
        os.makedirs(self._branches_dir(), exist_ok=True)
        # create-vs-expire TOCTOU (same shape as tag()): without the gc
        # lock, a concurrent expire on main can enumerate branches
        # BEFORE our rename lands and then sweep files reachable only
        # via the fork version, leaving a freshly created branch with a
        # broken closure. Publish under the lock, then verify the fork
        # version's full file closure and withdraw the branch if any of
        # it was already swept.
        with self.gc_lock():
            tmp = tempfile.mkdtemp(dir=self._branches_dir(),
                                   prefix=f".tmp-{name}-")
            try:
                # seed = hard link of the base manifest: the branch
                # keeps base's snapshot alive even after main expires it
                os.link(self.manifest_path(v),
                        os.path.join(tmp, os.path.basename(
                            self.manifest_path(v))))
                # durable fork point: merge_branch must not infer the
                # fork from the branch's oldest RETAINED version (expire
                # with keep_last can sweep the seed manifest, inflating
                # that guess past the true fork and letting a
                # "fast-forward" silently drop main's post-fork commits)
                with open(os.path.join(tmp, ".branch.json"), "w") as f:
                    f.write(_json.dumps({"name": name, "fork_version": v,
                                         "created_at": time.time()}))
                try:
                    os.rename(tmp, bdir)  # atomic: branch appears complete
                except OSError:
                    raise StateError(
                        f"branch {name!r} already exists") from None
            finally:
                if os.path.isdir(tmp):
                    shutil.rmtree(tmp, ignore_errors=True)
            missing = None
            if not os.path.exists(self.manifest_path(v)):
                missing = f"manifest v{v}"
            else:
                for rel in self._closure_paths(v):
                    if not os.path.exists(self.abspath(rel)):
                        missing = rel
                        break
            if missing is not None:
                shutil.rmtree(bdir, ignore_errors=True)
                raise StateError(
                    f"version {v} was expired while branching "
                    f"(missing {missing}); re-branch from a retained "
                    f"version")
        return self.branch(name)

    def branch(self, name: str) -> "BranchTable":
        return BranchTable(self.root, name)

    def delete_branch(self, name: str) -> None:
        """Drop a branch line. Its manifests disappear immediately;
        data/shard files unique to the branch become unreachable and
        are swept by the next ``expire``. Runs under the gc lock so a
        concurrent expire never sees a half-deleted line."""
        import shutil

        bdir = os.path.join(self._branches_dir(), name)
        if not os.path.isdir(bdir):
            raise StateError(f"no such branch {name!r}")
        with self.gc_lock():
            tmp = bdir + f".deleting-{uuid.uuid4().hex[:8]}"
            os.rename(bdir, tmp)  # atomic disappearance
            shutil.rmtree(tmp)

    def merge_branch(self, name: str) -> "Manifest":
        """Fast-forward the MAIN line to a branch's latest state.

        Allowed only when main has not advanced past the branch's
        fork point (true fast-forward — the branch state already
        contains main's); otherwise raises CommitConflict and the
        caller rebases by re-running its maintenance on a fresh
        branch. The merge is one ordinary optimistic commit publishing
        the branch's manifest content as main's next version, so it
        inherits CAS atomicity, snapshot isolation and the txn ledger
        (exactly-once watermarks travel with the branch)."""
        import json as _json

        if self.is_branch:
            raise StateError("merge_branch runs on the main handle")
        bt = self.branch(name)
        bvs = bt.versions()
        # fork point comes from the branch's durable metadata written
        # at create_branch, NOT from bvs[0]: after expire(keep_last=..)
        # sweeps the seed manifest on the branch line, the oldest
        # RETAINED version inflates past the true fork and the
        # fast-forward guard below would wave through a merge that
        # silently drops main's post-fork commits.
        meta_path = os.path.join(self._branches_dir(), name,
                                 ".branch.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                fork = int(_json.load(f)["fork_version"])
        else:  # pre-metadata branch (older layout): best-effort guess
            fork = bvs[0]
        bm = bt.read_manifest(bvs[-1])

        def build(latest: Manifest) -> Manifest | None:
            if latest.version > fork:
                raise CommitConflict(
                    f"main advanced to v{latest.version} past branch "
                    f"{name!r}'s fork point v{fork}; fast-forward "
                    f"merge only — re-branch and replay")
            if bvs[-1] == fork:
                return None  # branch never committed: merge is a no-op
            return Manifest(
                version=0, parent=None, kind="branch_merge",
                schema=bm.schema, fragments=list(bm.fragments),
                txn=dict(bm.txn),
                properties={**bm.properties, "merged_branch": name,
                            "merged_branch_version": bvs[-1]})

        return self.commit(build)

    def clone(self, dest_root: str,
              version: int | None = None) -> "Table":
        """Zero-copy SHALLOW CLONE of one snapshot into a brand-new
        table root (Delta ``CREATE TABLE ... SHALLOW CLONE``): every
        data/delete file in the snapshot's closure is HARD-LINKED into
        the clone at the same relative path (no bytes copied; all
        paths in the format are root-relative, so the clone reads
        itself), and the clone starts its own manifest line at v0 with
        kind="clone". The two tables are fully independent afterwards:
        commits on either never touch the other, and ``expire`` on
        either unlinks only its own links — shared file data is freed
        when the last table drops it. The txn ledger travels with the
        clone (like rollback: exactly-once replay bookkeeping outlives
        re-rooting). Runs under the source's gc lock so a concurrent
        expire can never sweep closure files mid-link (the tag()/
        create_branch() TOCTOU); cross-device destinations fall back
        to file copies."""
        import shutil

        dest_root = os.path.abspath(dest_root)
        if os.path.isdir(os.path.join(dest_root, "manifest")):
            raise StateError(f"destination {dest_root} is already "
                             f"a table")
        with self.gc_lock():
            v = self.latest_version() if version is None else int(version)
            m = self.read_manifest(v)  # resolves shards → full list
            for d in _DIRS:
                os.makedirs(os.path.join(dest_root, d), exist_ok=True)
            rels = []
            for f in m.fragments:
                rels.append(f.path)
                rels.extend(f.delete_paths)
            for rel in rels:
                src, dst = self.abspath(rel), os.path.join(dest_root, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                try:
                    os.link(src, dst)
                except FileExistsError:
                    pass  # delete files can be shared by fragments
                except OSError:  # EXDEV: cross-device → copy
                    shutil.copy2(src, dst)
            t = Table.__new__(Table)
            t.root = dest_root
            t._publish(Manifest(
                version=0, parent=None, kind="clone", schema=m.schema,
                fragments=list(m.fragments),
                txn={k: dict(pv) for k, pv in m.txn.items()},
                properties={**m.properties, "cloned_from": self.root,
                            "cloned_version": v}))
        return t

    def snapshot(self, version: int | None = None,
                 as_of: float | None = None,
                 tag: str | None = None) -> Snapshot:
        """Snapshot by version number, unix timestamp (``as_of``),
        tag name, or latest. A snapshot is immutable: reads are
        isolated from concurrent commits."""
        if sum(x is not None for x in (version, as_of, tag)) > 1:
            raise ValueError("pass at most one of version/as_of/tag")
        if as_of is not None:
            version = self.version_as_of(as_of)
        if tag is not None:
            tv = self.tags().get(tag)
            if tv is None:
                raise StateError(f"no such tag {tag!r}")
            version = tv
        return Snapshot(self, self.read_manifest(version))

    def schema(self) -> pa.Schema:
        return self.read_manifest().schema

    # -- commit ------------------------------------------------------------
    def _publish(self, m: Manifest, parent: Manifest | None = None) -> None:
        """Atomically create manifest vN via write-temp + hard-link (CAS).

        Past ``SHARD_THRESHOLD`` fragments the fragment list goes into
        shard files (parent shards reused when unchanged — commit I/O
        is O(changed fragments)); shard files written by a losing CAS
        attempt become unreferenced and are swept by expire."""
        from .manifest import plan_shards

        fragment_lists = plan_shards(parent, m, self.root)
        final = self.manifest_path(m.version)
        fd, tmp = tempfile.mkstemp(dir=self._manifest_dir(), prefix=".tmp-",
                                   suffix=f"-{uuid.uuid4().hex[:8]}")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(m.to_json_str(fragment_lists=fragment_lists))
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, final)  # atomic; EEXIST == lost the race
            except FileExistsError:
                raise CommitConflict(
                    f"version {m.version} already committed by another writer")
        finally:
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass

    def commit(self, build: Callable[[Manifest], Manifest | None],
               max_attempts: int = 3) -> Manifest | None:
        """Optimistic-concurrency commit.

        ``build(latest)`` returns the next Manifest (version/parent are
        overwritten here) or None for an intentional no-op (e.g. a fully
        replayed MERGE batch). On CAS conflict, re-reads latest, re-runs
        ``build`` (which must revalidate its assumptions — e.g. that the
        fragments it rewrites are still live), and retries. Mirrors the
        reference's bounded commit retry (src/kafka/mod.rs:192-228,
        max_attempts=3).
        """
        last_err: Exception | None = None
        for _ in range(max_attempts):
            latest = self.read_manifest()
            m = build(latest)
            if m is None:
                return None
            m.version = latest.version + 1
            m.parent = latest.version
            try:
                self._publish(m, parent=latest)
                return m
            except CommitConflict as e:
                last_err = e
                continue
        raise CommitConflict(
            f"commit failed after {max_attempts} attempts: {last_err}")


class BranchTable(Table):
    """Handle to one branch line: identical engine surface to
    ``Table`` (snapshot/commit/history/pipelines all resolve through
    ``_manifest_dir()``), rooted at ``manifest/branches/<name>/``.
    Data, delete and shard files are shared with the main line —
    file paths are root-relative, so reads and commits resolve
    against the same table root."""

    is_branch = True

    def __init__(self, root: str, name: str):
        self.root = os.path.abspath(root)
        self.branch_name = name
        if not os.path.isdir(self._manifest_dir()):
            raise StateError(f"no such branch {name!r} in {root}")

    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "manifest", "branches",
                            self.branch_name)
