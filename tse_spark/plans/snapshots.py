"""Iceberg-style snapshots, time travel, and vacuum for the index.

Every maintenance operation (build, append, delete, compact) publishes
its state by atomically replacing ``meta.json`` — and because each of
them writes its outputs into NEW versioned directories and never
rewrites a referenced file, every superseded meta still describes a
complete, readable index.  This module makes that history first-class:

- :func:`publish_meta` is the ONE meta commit point all plans share.
  It stamps a monotonically increasing ``snapshot_id`` + operation tag,
  archives the full meta under ``snapshots/v{id}.json``, then performs
  the atomic ``meta.json`` replace.  meta.json remains the commit: a
  crash after the archive write but before the replace leaves an
  unreferenced snapshot file that the retried operation overwrites.
- :func:`load_index_at` opens the index AS OF a snapshot — the
  time-travel read.  It serves from the directories that snapshot
  referenced, which exist until vacuumed.
- :func:`vacuum_index` is expire-snapshots + garbage collection: keep
  the current meta plus the newest ``keep`` archived snapshots, delete
  every index artifact directory referenced by nothing retained.
  Only directories matching the index's own artifact naming law
  (docs*/postings*/term_stats*/tombstones*) are candidates — stage
  checkpoints (tf) and manifests are never touched.  Facet sidecar
  dirs (facets*) are GC'd against the sidecar's OWN commit point
  (facets_meta.json): a superseded ``facets_base_v*`` left behind by
  a rebuild is garbage exactly like an old postings dir.
- :func:`snapshot_diff` reports what changed between two snapshots
  (op chain, doc/token/tombstone deltas, dirs added/removed).

At web scale this is the contract object stores need: writers never
mutate referenced files, readers pin a snapshot, and GC is an explicit,
auditable operation — exactly Iceberg's snapshot/expire model, modeled
here with one JSON per snapshot instead of Avro manifest lists.
"""

from __future__ import annotations

import json
import os
import re
import shutil

SNAP_DIR = "snapshots"

# artifact dirs owned by the index meta (vacuum candidates); anything
# else in out_dir (tf checkpoint, _manifest.json, facets sidecar dirs,
# ANN tables) belongs to other metas/manifests and is out of scope
_ARTIFACT_RE = re.compile(
    r"^(docs|postings|term_stats|tombstones)(_.*)?$"
)


def _serving_dirs(meta: dict) -> set[str]:
    """Dirs the ENGINE reads — what a time-travel load must find.  The
    docs dirs are deliberately absent: run_from_docs indexes never
    persist one, and serving doesn't touch it."""
    out = set(meta.get("postings_dirs", ["postings"]))
    out.add(meta.get("term_stats_dir", "term_stats"))
    if meta.get("tombstones_dir"):
        out.add(meta["tombstones_dir"])
    return out


def _referenced_dirs(meta: dict) -> set[str]:
    """Everything a meta references (vacuum retention set) — serving
    dirs plus the docs dirs maintenance ops (append's url anti-join,
    compact's tombstone fold, facet rebuilds) read."""
    return _serving_dirs(meta) | set(meta.get("docs_dirs", ["docs"]))


class ConcurrentCommit(RuntimeError):
    """Another writer committed since this operation loaded the index.
    The operation's outputs live in its own versioned dirs, so nothing
    is corrupted — reload the index and re-run the operation against
    the new current state (Iceberg's optimistic-retry contract)."""


def publish_meta(
    out_dir: str,
    meta: dict,
    op: str,
    expect_snapshot_id: int | None = None,
) -> dict:
    """Commit ``meta`` as the index's current state: stamp the next
    ``snapshot_id`` (+ ``snapshot_op``), archive a full copy under
    ``snapshots/v{id}.json``, then atomically replace ``meta.json``.
    Returns the stamped meta.  Retry-safe: a crashed publish re-runs
    with the same id and overwrites the same archive file.

    ``expect_snapshot_id`` is the optimistic-concurrency guard
    (Iceberg's commit protocol): the caller passes the snapshot_id it
    LOADED, and the commit succeeds only if that is still current —
    otherwise :class:`ConcurrentCommit` is raised and the caller must
    reload + re-run.  The check-and-swap runs under an advisory file
    lock so two same-host writers serialize; on an object store the
    same compare-and-swap belongs in the catalog."""
    import contextlib

    meta_path = os.path.join(out_dir, "meta.json")

    @contextlib.contextmanager
    def _commit_lock():
        lock_path = os.path.join(out_dir, ".commit.lock")
        f = open(lock_path, "w")
        try:
            try:
                import fcntl

                fcntl.flock(f, fcntl.LOCK_EX)
            except ImportError:  # pragma: no cover - non-posix
                pass
            yield
        finally:
            f.close()

    with _commit_lock():
        prev_id = 0
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                prev_id = int(json.load(f).get("snapshot_id", 0))
        if (
            expect_snapshot_id is not None
            and prev_id != int(expect_snapshot_id)
        ):
            raise ConcurrentCommit(
                f"index at {out_dir} moved to snapshot v{prev_id} while "
                f"this '{op}' was running against v{expect_snapshot_id} "
                "— reload and re-run against the current state"
            )
        meta = dict(meta)
        meta["snapshot_id"] = prev_id + 1
        meta["snapshot_op"] = op
        snap_root = os.path.join(out_dir, SNAP_DIR)
        os.makedirs(snap_root, exist_ok=True)
        spath = os.path.join(snap_root, f"v{meta['snapshot_id']}.json")
        tmp = spath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, spath)
        # the COMMIT: readers switch states here and only here
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, meta_path)
    return meta


def list_snapshots(out_dir: str) -> list[dict]:
    """All archived snapshots, oldest first: (snapshot_id, op, n_docs,
    built/dir info) — the index's commit log."""
    snap_root = os.path.join(out_dir, SNAP_DIR)
    if not os.path.isdir(snap_root):
        return []
    out = []
    for name in os.listdir(snap_root):
        m = re.fullmatch(r"v(\d+)\.json", name)
        if not m:
            continue
        with open(os.path.join(snap_root, name)) as f:
            out.append(json.load(f))
    return sorted(out, key=lambda s: s["snapshot_id"])


def load_index_at(
    spark,
    out_dir: str,
    snapshot_id: int,
    dictionary: frozenset[bytes] = frozenset(),
):
    """Time travel: open the index AS OF ``snapshot_id``.  Raises with
    a clear message when the snapshot was never archived (pre-snapshot
    index) or its directories were vacuumed away."""
    from tse_spark.plans import pipeline as pl

    spath = os.path.join(out_dir, SNAP_DIR, f"v{int(snapshot_id)}.json")
    if not os.path.exists(spath):
        raise ValueError(
            f"no snapshot v{snapshot_id} at {out_dir} — see "
            "list_snapshots for the retained commit log"
        )
    with open(spath) as f:
        meta = json.load(f)
    missing = [
        d
        for d in _serving_dirs(meta)
        if not os.path.exists(os.path.join(out_dir, d))
    ]
    if missing:
        raise ValueError(
            f"snapshot v{snapshot_id} references vacuumed dirs "
            f"{sorted(missing)} — expired snapshots are not readable"
        )
    return pl.handle_from_meta(spark, out_dir, meta, dictionary)


def snapshot_diff(out_dir: str, a: int, b: int) -> dict:
    """What changed between two snapshots — the commit-log answer to
    "what did that maintenance window do": the operation chain, doc
    and token-count deltas, tombstone delta, and the artifact dirs
    added/removed.  Pure metadata (two JSON reads + the log listing);
    no Spark job."""
    snaps = {s["snapshot_id"]: s for s in list_snapshots(out_dir)}
    for sid in (a, b):
        if sid not in snaps:
            raise ValueError(
                f"no snapshot v{sid} at {out_dir} (retained: "
                f"{sorted(snaps)})"
            )
    sa, sb = snaps[int(a)], snaps[int(b)]
    da, db = _referenced_dirs(sa), _referenced_dirs(sb)
    return {
        "from": int(a),
        "to": int(b),
        "ops": [
            s.get("snapshot_op")
            for s in sorted(snaps.values(), key=lambda s: s["snapshot_id"])
            if int(a) < s["snapshot_id"] <= int(b)
        ],
        "n_docs_delta": int(sb.get("n_docs", 0)) - int(sa.get("n_docs", 0)),
        "total_dl_delta": int(sb.get("total_dl", 0))
        - int(sa.get("total_dl", 0)),
        "n_tombstones": {
            "from": int(sa.get("n_tombstones", 0)),
            "to": int(sb.get("n_tombstones", 0)),
        },
        "dirs_added": sorted(db - da),
        "dirs_removed": sorted(da - db),
        "shard_range": {
            "from": sa.get("shard_range"),
            "to": sb.get("shard_range"),
        },
    }


def vacuum_index(
    out_dir: str, keep: int = 2, dry_run: bool = False
) -> dict:
    """Expire old snapshots and delete the artifact directories only
    they referenced.  ``keep`` retains the newest N archived snapshots
    IN ADDITION to the current meta (keep=0 keeps only the live state).
    Returns {"removed_dirs": [...], "expired_snapshots": [...]} —
    with ``dry_run=True`` it only reports.

    Safe by construction: the retained set is computed from metas, the
    candidate set is restricted to the index's own artifact naming law,
    and the current meta's dirs are always retained — a concurrent
    reader of a RETAINED snapshot never loses a file."""
    with open(os.path.join(out_dir, "meta.json")) as f:
        current = json.load(f)
    snaps = list_snapshots(out_dir)
    cur_id = int(current.get("snapshot_id", 0))
    retained = [s for s in snaps if s["snapshot_id"] > cur_id - 1 - keep]
    expired = [
        s
        for s in snaps
        if s["snapshot_id"] <= cur_id - 1 - keep
        and s["snapshot_id"] != cur_id
    ]
    keep_dirs = _referenced_dirs(current)
    for s in retained:
        keep_dirs |= _referenced_dirs(s)
    # PROVENANCE-based candidates: only dirs some EXPIRED snapshot
    # referenced are garbage.  Dirs referenced by no snapshot at all
    # are never touched — they are either another writer's IN-FLIGHT
    # outputs (written before its atomic publish; deleting them would
    # let that commit succeed pointing at nothing) or crash orphans a
    # retry will overwrite.
    candidates = set()
    for s in expired:
        candidates |= _referenced_dirs(s)
    removed = []
    for name in sorted(candidates - keep_dirs):
        full = os.path.join(out_dir, name)
        if not os.path.isdir(full) or not _ARTIFACT_RE.fullmatch(name):
            continue
        removed.append(name)
        if not dry_run:
            shutil.rmtree(full, ignore_errors=True)
    # facet sidecar garbage: its own meta (facets_meta.json, a separate
    # commit point maintained by operators/facets.py) lists the live
    # dirs; rebuilds leave superseded facets_base_v* dirs behind unless
    # gc'd at rebuild time.  Sidecars WITHOUT a meta (legacy bare
    # 'facets' dir) are skipped entirely — no meta, no safe retention
    # set, no GC.
    fmeta_path = os.path.join(out_dir, "facets_meta.json")
    if os.path.exists(fmeta_path):
        with open(fmeta_path) as f:
            fmeta = json.load(f)
        live_facets = set(fmeta["dirs"])
        fversion = int(fmeta.get("version", 0))
        fhwm = int(fmeta.get("max_doc_id", -1))
        for name in sorted(os.listdir(out_dir)):
            full = os.path.join(out_dir, name)
            if (
                not os.path.isdir(full)
                or not re.fullmatch(r"facets(_.*)?", name)
                or name in live_facets
            ):
                continue
            # protect possibly-IN-FLIGHT sidecar writes (published only
            # via facets_meta.json later): a rebuild targets version
            # fversion+1 and an append targets a delta base above the
            # live high-water mark — neither may be deleted
            m = re.fullmatch(r"facets_base_v(\d+)", name)
            if m and int(m.group(1)) > fversion:
                continue
            m = re.fullmatch(r"facets_delta_(\d+)", name)
            if m and int(m.group(1)) > fhwm:
                continue
            removed.append(name)
            if not dry_run:
                shutil.rmtree(full, ignore_errors=True)
    expired_ids = [s["snapshot_id"] for s in expired]
    if not dry_run:
        for sid in expired_ids:
            try:
                os.remove(
                    os.path.join(out_dir, SNAP_DIR, f"v{sid}.json")
                )
            except FileNotFoundError:
                pass
    return {"removed_dirs": removed, "expired_snapshots": expired_ids}


def term_drift(spark, out_dir: str, sid_a: int, sid_b: int, k: int = 20):
    """Vocabulary drift between two retained snapshots: the k terms
    whose document frequency moved most between state A and state B —
    the content-level twin of :func:`snapshot_diff` (which reads only
    metadata).  The curation question it answers: *what did this
    recrawl / append / takedown actually do to the corpus?* — topic
    surges, spam floods, or an extraction regression all show up as df
    movers long before they show up in relevance metrics.

    Both states open through the commit log (:func:`load_index_at`),
    so the comparison is between PUBLISHED index states, not raw
    corpora; df comes from each state's term_stats (one tiny
    vocabulary-sized relation per side — no posting decode, no corpus
    scan).  Deterministic cut: order by (|delta| desc, term) — a total
    order any engine reproduces.

    Returns (term, df_a, df_b, delta) with absent terms counted 0.
    """
    from pyspark.sql import functions as F

    ha = load_index_at(spark, out_dir, sid_a)
    hb = load_index_at(spark, out_dir, sid_b)
    a = ha.term_stats.select("term", F.col("df").alias("df_a"))
    b = hb.term_stats.select("term", F.col("df").alias("df_b"))
    j = (
        a.join(b, "term", "full_outer")
        .select(
            "term",
            F.coalesce("df_a", F.lit(0)).cast("long").alias("df_a"),
            F.coalesce("df_b", F.lit(0)).cast("long").alias("df_b"),
        )
        .withColumn("delta", (F.col("df_b") - F.col("df_a")).cast("long"))
    )
    return j.orderBy(F.abs("delta").desc(), "term").limit(k)
