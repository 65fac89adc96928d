"""Multi-PROCESS concurrent-writer stress: N independent OS processes
append to one table simultaneously (each its own Ray-free arrow write
path via the fragment writer + CAS), racing the manifest hard-link.
Pins the optimistic-concurrency protocol under real process
concurrency: every append lands exactly once, versions are a gapless
chain, and the final scan is the union of all writers' rows."""

import os
import subprocess
import sys
import textwrap

import pyarrow as pa

from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table

N_WRITERS = 4
COMMITS_PER_WRITER = 4
ROWS_PER_COMMIT = 5

_WORKER = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import numpy as np
    import pyarrow as pa
    from kafka_delta_rs_ray.codecs import encode
    from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table
    from kafka_delta_rs_ray.tablefmt.fragments import (FragmentWriter,
                                                       frags_from_meta)
    from kafka_delta_rs_ray.pipelines.ingest import commit_fragments

    root, wid = sys.argv[1], int(sys.argv[2])
    t = Table(root)
    px = encode(np.zeros((1, 1, 3), dtype=np.uint8), "rawz")
    w = FragmentWriter(root, f"w{{wid}}")
    for c in range({commits}):
        rows = [{{"image_id": f"w{{wid}}-c{{c}}-r{{r}}", "bytes": px,
                  "w": 1, "h": 1, "fmt": "rawz", "caption": "x",
                  "phash": 0}} for r in range({rows})]
        meta = w(pa.Table.from_pylist(rows, schema=IMAGE_SCHEMA))
        frags = frags_from_meta(meta.to_pylist())
        # CAS races the other 3 processes; commit() retries 3x per call
        # and the app layer retries the call (the reference's caller
        # contract: CommitConflict -> rerun), so a long losing streak
        # under the 4-way race cannot fail the writer spuriously
        from kafka_delta_rs_ray.errors import CommitConflict
        for attempt in range(10):
            try:
                m = commit_fragments(t, frags, IMAGE_SCHEMA)
                break
            except CommitConflict:
                continue
        else:
            raise SystemExit("commit never landed after 10 rounds")
        assert m is not None
    print("done", wid)
""").format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            commits=COMMITS_PER_WRITER, rows=ROWS_PER_COMMIT)


def test_concurrent_process_writers(tmp_path):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    procs = [subprocess.Popen([sys.executable, "-c", _WORKER,
                               t.root, str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for i in range(N_WRITERS)]
    fails = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        if p.returncode != 0:
            fails.append(err[-2000:])
    assert not fails, f"writer failed: {fails[0]}"

    versions = t.versions()
    assert versions == list(range(len(versions)))  # gapless chain
    assert len(versions) == 1 + N_WRITERS * COMMITS_PER_WRITER

    tb = t.snapshot().to_arrow()
    ids = tb["image_id"].to_pylist()
    assert len(ids) == len(set(ids)) == (
        N_WRITERS * COMMITS_PER_WRITER * ROWS_PER_COMMIT)
    # every parent pointer links the chain (snapshot isolation held)
    for v in versions[1:]:
        assert t.read_manifest(v).parent == v - 1
