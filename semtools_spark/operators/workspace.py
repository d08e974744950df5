"""Workspace — the reference's persistent incremental embedding store
(src/workspace/, 1,687 LoC) re-expressed as parquet tables + joins.

Reference semantics reproduced (file:line cites into /root/reference):
  W1 incremental state scan (New/Changed/Unchanged by size/mtime/_version)
                                              workspace/store.rs:549-611
  W2 metadata lookup (semi-join, ≤1000-path chunks — an artifact Spark
     doesn't need; ours is one join)          store.rs:185-232
  W3/W4 idempotent upsert via deterministic keys (FNV-1a ids → natural
     keys (url) / (url, line_no) + MERGE)     store.rs:373-434,650-661
  W5 filtered ANN search + threshold pushdown + 2× oversample
     (ours is exact per-partition top-k — strictly better than the
     reference's oversample heuristic, which can miss)  store.rs:481-546
  W6 final merge-sort + truncate              store.rs:538-545
  W7 cascade delete                           store.rs:235-370
  W8 prune = stored ∖ existing (anti-join)    cmds/workspace.rs:115-160
  W9 exact counts / stats                     store.rs:614-637,437-445

Storage: two parquet tables under a workspace root, laid out as hive
partitions ``__bucket = pmod(xxhash64(doc), n_buckets)`` (the Iceberg
stand-in — no connector jars in this sandbox). MERGE/DELETE are
emulated as anti-join ∪ updates **scoped to the buckets containing the
updated keys**: only those bucket directories are read (partition-pruned
scan) — O(delta) per incremental sync, not O(table), which is what
makes the incremental story survive a 100 TB workspace. Since r6 the
commit is SNAPSHOT-ISOLATED: touched buckets stage immutable
``g_<run>`` generation dirs and one atomically-published
``_current.<seq>.json`` pointer is the single commit point (see the
protocol comment at :func:`_gen_pointer`), so concurrent readers never
observe a half-committed multi-bucket swap. The idempotent-upsert
semantics the reference gets from content-derived ids
(store.rs:972-975) are preserved: re-running any MERGE/DELETE
converges, which is also the crash-repair story for a kill anywhere in
the commit (exhaustive IO-boundary crash sweep in
tests/test_workspace.py). At cluster scale the same code targets
Iceberg `MERGE INTO` — the join shape is identical and the pointer IS
the poor-man's snapshot Iceberg metadata would provide.

Known limitation (scoped like Iceberg's): isolation is PER TABLE. One
sync commits lines then manifest, so a reader between the two commits
can pair the new lines snapshot with the old manifest — each internally
consistent, jointly one mutation apart. Multi-table transactions are
what a real catalog adds on top (Iceberg needs one too); within this
module the pairing is harmless to search (lines are scored, the
manifest only gates state classification) and the writer lease keeps
mutations serialized.

Every table/config path goes through the Hadoop FS API
(:mod:`semtools_spark.fs`) of the session's Hadoop conf — the same code
runs against file://, hdfs://, or an object-store connector; no
``os.path``/``os.rename`` on table paths (the directory swap is atomic on
HDFS/local; see fs.py for the object-store caveat — there, front the
tables with Iceberg MERGE INTO).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semtools_spark import fs as hfs
from semtools_spark.embedding import DEFAULT_SEED, embed_udf
from semtools_spark.operators.search import split_lines

CURRENT_EMBEDDING_VERSION = 1  # reference CURRENT_EMBEDDING_VERSION, store.rs:29-34

STATE_NEW = "new"
STATE_CHANGED = "changed"
STATE_UNCHANGED = "unchanged"
STATE_STALE = "stale"  # in store but no longer in the source → prune target


def classify_states(
    incoming: DataFrame,
    manifest: DataFrame | None,
    key: str = "doc",
    cmp_cols: tuple[str, ...] = ("size_bytes", "mtime"),
    version_col: str = "_version",
) -> DataFrame:
    """W1: full-outer join of incoming metadata vs the stored manifest →
    (key, state). Changed iff any cmp col differs or the stored _version
    lags CURRENT_EMBEDDING_VERSION (store.rs:549-611; version bump forces
    re-embed per store.rs:1217-1260 test)."""
    if manifest is None or manifest.isEmpty():
        return incoming.select(F.col(key), F.lit(STATE_NEW).alias("state"))
    inc = incoming.select(
        F.col(key).alias("__ik"), *[F.col(c).alias(f"__i_{c}") for c in cmp_cols]
    )
    man_cols = [F.col(key).alias("__mk")] + [
        F.col(c).alias(f"__m_{c}") for c in cmp_cols
    ]
    if version_col in manifest.columns:
        man_cols.append(F.col(version_col).alias("__m_ver"))
    man = manifest.select(*man_cols)
    j = inc.join(man, inc["__ik"] == man["__mk"], "full_outer")
    changed = F.lit(False)
    for c in cmp_cols:
        changed = changed | (F.col(f"__i_{c}") != F.col(f"__m_{c}"))
    if version_col in manifest.columns:
        changed = changed | (F.col("__m_ver") < F.lit(CURRENT_EMBEDDING_VERSION))
    state = (
        F.when(F.col("__mk").isNull(), STATE_NEW)
        .when(F.col("__ik").isNull(), STATE_STALE)
        .when(changed, STATE_CHANGED)
        .otherwise(STATE_UNCHANGED)
    )
    return j.select(F.coalesce("__ik", "__mk").alias(key), state.alias("state"))


#: hive-style partition column of the bucketed table layout
BUCKET_COL = "__bucket"

#: MERGE rewrites whole buckets, so a bucket is the unit of write
#: amplification: target ~256 MiB of parquet per bucket — small enough
#: that a single-doc upsert rewrites ≲256 MiB, large enough that a
#: 100 TB table stays under ~half a million partition dirs. Behind a
#: real catalog this is Iceberg's bucket-transform partition count.
TARGET_BUCKET_BYTES = 256 * 1024 * 1024

#: default writer-lease validity; a writer that has not renewed (every
#: mutation re-stamps it) within this window is presumed crashed and its
#: lease is reclaimed
DEFAULT_LEASE_TTL_SEC = 900


def buckets_for_bytes(expected_table_bytes: int) -> int:
    """n_buckets for an expected table size: the next power of two of
    ``bytes / TARGET_BUCKET_BYTES``, clamped to [1, 2^20]. Power of two
    so a future 2× rebucket splits every bucket evenly."""
    import math

    raw = max(1, -(-int(expected_table_bytes) // TARGET_BUCKET_BYTES))
    return min(1 << 20, 1 << math.ceil(math.log2(raw)))


class ConcurrentWriterError(IOError):
    """A live writer lease belonging to another writer was found."""


def _bucket_expr(key_col: str, num_buckets: int):
    # pmod, not abs(hash) % n: abs(Long.MIN_VALUE) overflows BIGINT
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets)).cast("int")


def _bucket_ids(spark: SparkSession, table_path: str) -> list[int]:
    """Bucket ids present (empty for a legacy unbucketed table). For a
    generation-pointer table these are the pointer's referenced buckets —
    staged-but-uncommitted generations are invisible, same as to readers."""
    ptr = _gen_pointer(spark, table_path)
    if ptr is not None:
        return sorted(int(k) for k in ptr[2])
    return sorted(
        int(name.split("=", 1)[1])
        for name, _size, is_dir in hfs.listdir(spark, table_path)
        if is_dir and name.startswith(f"{BUCKET_COL}=")
    )


# ---------------------------------------------------------------------------
# generation-pointer commit protocol (reader snapshot isolation)
# ---------------------------------------------------------------------------
# A multi-bucket swap done as N sequential directory renames has no single
# commit point: a reader that plans its scan mid-sequence can see bucket k
# new and bucket k+1 old — a mixed table no snapshot ever contained (the
# r5 VERDICT's missing piece; Iceberg snapshots, or the reference's
# single-process store, store.rs:146-177, give this for free). The v2
# layout closes it the Iceberg way, minus the connector jars:
#
#   <table>/_current.<seq>.json          ← the snapshot pointer
#   <table>/__bucket=K/g_<run>/part-*.parquet
#
# Data directories are immutable once written. A mutation stages new
# g_<run> dirs for the touched buckets (invisible to readers — the
# pointer still names the old generations), then COMMITS by writing ONE
# new pointer file with the next sequence number — a single atomic
# create, the only commit point — and finally garbage-collects the
# replaced generations. Readers resolve the highest-sequence pointer and
# scan exactly the directories it names (basePath-anchored, so hive
# partition parsing and PartitionFilters pruning are unchanged — and a
# raw ``spark.read.parquet(table)`` still works between mutations, since
# GC keeps exactly one generation per bucket on disk).
#
# Crash windows: before the pointer write, staged generations are
# unreferenced — readers keep the old snapshot, and the next mutation's
# sweep removes them before re-running (the MERGE is idempotent). After
# the pointer write, the commit is durable; leftover old generations are
# swept later. The pointer file itself appears atomically (written to a
# tmp name, renamed into place), so no reader ever parses a torn pointer.
# The one residual race — a reader that resolved the OLD pointer and is
# still scanning when post-commit GC deletes those directories — is
# closed by the OPT-IN retention property (set_snapshot_retention):
# with retain=N the last N replaced snapshots stay on disk and readable
# (read_snapshot(seq=...) time-travels over them), pruned by
# expire_snapshots / the next commit, bounded to expired-touched
# buckets. The default stays retain=0 (immediate GC) because retention
# trades away raw-root readability: spark.read.parquet(root) on a
# retaining table sees one row-copy per retained generation — pointer
# reads (every reader in this module) are unaffected.

_POINTER_PREFIX = "_current."

#: test-only injection point: called with the bucket id after each staged
#: generation rename, BEFORE the pointer commit — lets tests read the
#: table mid-commit and prove snapshot isolation (or crash the commit)
_TEST_MID_COMMIT_HOOK = None


def _pointer_seqs(spark: SparkSession, table_path: str) -> list[int]:
    """All pointer sequence numbers on disk, ascending (several coexist
    when the table retains snapshots; exactly one otherwise)."""
    if not hfs.exists(spark, table_path):
        return []
    seqs: list[int] = []
    for name, _size, is_dir in hfs.listdir(spark, table_path):
        if is_dir or not (
            name.startswith(_POINTER_PREFIX) and name.endswith(".json")
        ):
            continue
        try:
            seqs.append(int(name[len(_POINTER_PREFIX):-len(".json")]))
        except ValueError:
            continue
    return sorted(seqs)


def _read_pointer(spark: SparkSession, table_path: str, seq: int) -> "dict | None":
    import json

    text = hfs.read_text(spark, f"{table_path}/{_POINTER_PREFIX}{seq}.json")
    return None if text is None else json.loads(text)


def _gen_pointer(
    spark: SparkSession, table_path: str, _retry: int = 2
) -> "tuple[int, str, dict[str, str]] | None":
    """(seq, part_col, {partition_value: gen_dirname}) from the
    highest-sequence ``_current.<seq>.json``, or None (legacy layout).
    A listed-then-unreadable newest pointer (swept between the listing
    and the read) is retried with a fresh listing, BOUNDED to two
    attempts — a persistently unreadable file (permissions blip,
    eventually-consistent store) then degrades to the next-newest
    readable snapshot rather than recursing unboundedly (ADVICE r8)."""
    seqs = _pointer_seqs(spark, table_path)
    if not seqs:
        return None
    cur = _read_pointer(spark, table_path, seqs[-1])
    if cur is None:
        if _retry > 0:  # swept between listing and read: re-list
            return _gen_pointer(spark, table_path, _retry - 1)
        for s in reversed(seqs[:-1]):  # degrade: next-newest readable
            cur = _read_pointer(spark, table_path, s)
            if cur is not None:
                return s, cur["part_col"], dict(cur["gens"])
        return None
    return seqs[-1], cur["part_col"], dict(cur["gens"])


def _gen_retain(spark: SparkSession, table_path: str) -> int:
    """The table's snapshot-retention property (how many PREVIOUS
    snapshots stay readable after a commit; 0 = immediate GC, the
    default). Carried in the pointer file so it is sticky per table —
    the Iceberg-table-property analog."""
    seqs = _pointer_seqs(spark, table_path)
    if not seqs:
        return 0
    cur = _read_pointer(spark, table_path, seqs[-1])
    return int(cur.get("retain", 0)) if cur else 0


def _write_gen_pointer(
    spark: SparkSession,
    table_path: str,
    seq: int,
    part_col: str,
    gens: "dict[str, str]",
    retain: int = 0,
) -> None:
    """Atomically publish pointer ``seq``: write to a tmp name, rename
    into ``_current.<seq>.json`` — the rename is the commit point, so the
    pointer file never exists half-written. Under the writer lease the
    sequence is unique; a failed rename means the invariant broke."""
    import json

    doc = {"part_col": part_col, "gens": gens}
    if retain:
        doc["retain"] = int(retain)
    tmp = f"{table_path}/.__ptr_tmp_{uuid.uuid4().hex}"
    hfs.write_text(spark, tmp, json.dumps(doc))
    dst = f"{table_path}/{_POINTER_PREFIX}{seq}.json"
    if not hfs.rename(spark, tmp, dst):
        hfs.delete(spark, tmp)
        raise IOError(f"generation commit: could not publish {dst}")


def set_snapshot_retention(
    spark: SparkSession, table_path: str, retain: int
) -> None:
    """Set how many PREVIOUS snapshots stay readable (and on disk) after
    each commit — the knob long-running readers need so post-commit GC
    cannot delete the generation they are mid-scan over. A metadata-only
    commit: publishes pointer ``seq+1`` with the same generations and the
    new ``retain`` value. With ``retain > 0`` the table must be read
    through the pointer (:func:`read_snapshot` / every reader in this
    module) — a RAW ``spark.read.parquet(root)`` would see one row-copy
    per retained generation; that trade is why 0 stays the default.
    Dropping retention back to 0 takes effect at the next mutation (or an
    explicit :func:`expire_snapshots`).

    Concurrency contract (ADVICE r8): run as THE single writer (under
    the workspace lease, or standalone). Racing a concurrent commit is
    fail-safe — both would publish pointer ``seq+1`` and the loser's
    atomic rename ABORTS (raises) rather than corrupting — but the
    retry belongs under the lease."""
    if retain < 0:
        raise ValueError(f"retain must be >= 0, got {retain}")
    ptr = _gen_pointer(spark, table_path)
    if ptr is None:
        raise IOError(
            f"{table_path} has no generation pointer (legacy layout) — "
            "run one bucketed mutation first, then set retention"
        )
    seq, part_col, gens = ptr
    _write_gen_pointer(spark, table_path, seq + 1, part_col, gens, retain=retain)
    if retain == 0:
        expire_snapshots(spark, table_path, keep_last=1)


def expire_snapshots(
    spark: SparkSession, table_path: str, keep_last: "int | None" = None
) -> int:
    """Remove snapshots older than the newest ``keep_last`` (default:
    the table's ``retain`` property + 1): delete their pointer files and
    every generation directory no retained pointer references. Bounded
    work — only buckets the EXPIRED pointers mention are listed, so the
    cost is O(buckets touched across expired snapshots), never a full
    table walk. Returns the number of generation directories removed.
    The Iceberg ``expireSnapshots`` analog.

    Concurrency contract (ADVICE r8): like every mutation here, this
    must run as THE single writer — under the workspace writer lease, or
    standalone when no concurrent writer exists. Two concurrent expires
    (or an expire racing a commit's GC) could both list a retained
    pointer and then see it deleted; rather than silently dropping that
    snapshot's generations from ``keep`` (which would delete data a
    retained — possibly current — snapshot still references), an
    unreadable RETAINED pointer aborts the expire (returns 0). The next
    expire, under the lease, runs clean."""
    seqs = _pointer_seqs(spark, table_path)
    if not seqs:
        return 0
    if keep_last is None:
        keep_last = _gen_retain(spark, table_path) + 1
    keep_last = max(1, keep_last)
    if len(seqs) <= keep_last:
        return 0
    expired, retained = seqs[:-keep_last], seqs[-keep_last:]
    part_col = None
    keep: dict[str, set] = {}
    for s in retained:
        doc = _read_pointer(spark, table_path, s)
        if doc is None:
            # a retained pointer that cannot be read means another
            # writer is mutating/expiring concurrently — deleting
            # anything now could collect generations that snapshot
            # still references (data loss). Abort; retry under the lease.
            return 0
        part_col = doc["part_col"]
        for val, gen in doc["gens"].items():
            keep.setdefault(val, set()).add(gen)
    check: set[str] = set()
    for s in expired:
        doc = _read_pointer(spark, table_path, s)
        if doc is not None:
            part_col = part_col or doc["part_col"]
            check.update(
                val
                for val, gen in doc["gens"].items()
                if gen not in keep.get(val, ())
            )
    removed = 0
    for val in sorted(check):
        part_dir = f"{table_path}/{part_col}={val}"
        if not hfs.exists(spark, part_dir):
            continue
        want = keep.get(val)
        if not want:
            hfs.delete(spark, part_dir)
            removed += 1
            continue
        for sub, _s, sub_dir in hfs.listdir(spark, part_dir):
            if sub_dir and sub.startswith("g_") and sub not in want:
                hfs.delete(spark, f"{part_dir}/{sub}")
                removed += 1
    for s in expired:
        hfs.delete(spark, f"{table_path}/{_POINTER_PREFIX}{s}.json")
    return removed


_INTENT_PREFIX = ".__intent_"


def _write_intent(
    spark: SparkSession, table_path: str, run: str, part_col: str, frags: list[str]
) -> str:
    """Record which partition dirs a commit is about to touch. The sweep
    reads these instead of walking EVERY bucket directory — without the
    intent, crash GC would be O(all buckets) per mutation (one listdir
    per bucket dir: half a million FS calls on a 100 TB table), which
    betrays the O(delta) MERGE contract the bucketing exists for."""
    import json

    path = f"{table_path}/{_INTENT_PREFIX}{run}.json"
    hfs.write_text(spark, path, json.dumps({"part_col": part_col, "frags": frags}))
    return path


def _gen_sweep(spark: SparkSession, table_path: str) -> None:
    """Writer-side GC (run under the lease, or at open-time repair when
    no live foreign lease): drop pointer files below the current
    sequence, orphaned ``.__ptr_tmp_`` files, and — for each leftover
    commit intent — generation dirs the current pointer does not
    reference in THAT commit's touched buckets (staged by a crashed
    writer, or replaced-but-not-collected by a crashed GC). One root
    listing when clean; O(touched buckets of crashed commits) otherwise.
    No-op on legacy tables."""
    import json

    ptr = _gen_pointer(spark, table_path)
    if ptr is None:
        return
    seq, _part_col, gens = ptr
    if not gens:
        # An empty-gens pointer is the signature of a delete_keys that
        # emptied EVERY bucket: the commit published {} and the caller
        # then removes the table root — a crash between the two leaves
        # this pointer as the table's final state. It references no
        # data, so the root is removable; finishing the delete here
        # restores convergence (otherwise _read_snapshot raises on
        # every read, the idempotent re-run hits the same raise, and
        # no mutation path ever repairs it). Delete-everything is
        # terminal even under retention — DROP is not snapshotted.
        hfs.delete(spark, table_path)
        return
    seqs = _pointer_seqs(spark, table_path)
    retained_seqs = set(seqs[-(_gen_retain(spark, table_path) + 1):])
    # union of every retained snapshot's generation per bucket — the
    # set crash GC must never touch
    keep: dict[str, set] = {}
    for s in sorted(retained_seqs):
        doc = _read_pointer(spark, table_path, s)
        if doc is not None:
            for val, gen in doc["gens"].items():
                keep.setdefault(val, set()).add(gen)
    intents: list[str] = []
    for name, _size, is_dir in hfs.listdir(spark, table_path):
        full = f"{table_path}/{name}"
        if is_dir:
            continue
        if name.startswith(".__ptr_tmp_"):
            hfs.delete(spark, full)
        elif name.startswith(_INTENT_PREFIX):
            intents.append(full)
        elif name.startswith(_POINTER_PREFIX) and name.endswith(".json"):
            try:
                if int(name[len(_POINTER_PREFIX):-len(".json")]) not in retained_seqs:
                    hfs.delete(spark, full)
            except ValueError:
                pass
    for intent_path in intents:
        text = hfs.read_text(spark, intent_path)
        if text is not None:
            try:
                intent = json.loads(text)
            except ValueError:
                intent = {"frags": []}
            for frag in intent.get("frags", ()):
                part_dir = f"{table_path}/{frag}"
                if not hfs.exists(spark, part_dir):
                    continue
                part_val = frag.split("=", 1)[1]
                want = keep.get(part_val)
                if not want:
                    hfs.delete(spark, part_dir)  # bucket no longer referenced
                    continue
                for sub, _s, sub_dir in hfs.listdir(spark, part_dir):
                    if sub_dir and sub.startswith("g_") and sub not in want:
                        hfs.delete(spark, f"{part_dir}/{sub}")
        hfs.delete(spark, intent_path)


def read_snapshot(
    spark: SparkSession, table_path: str, seq: "int | None" = None
) -> DataFrame:
    """Snapshot read at a specific sequence (time travel over retained
    snapshots; see :func:`set_snapshot_retention`), or the current one
    when ``seq`` is None."""
    if seq is None:
        return _read_snapshot(spark, table_path)
    doc = _read_pointer(spark, table_path, seq)
    if doc is None:
        raise IOError(
            f"snapshot {seq} of {table_path} does not exist (expired, or "
            f"never committed; on disk: {_pointer_seqs(spark, table_path)})"
        )
    leafs = [
        f"{table_path}/{doc['part_col']}={val}/{gen}"
        for val, gen in sorted(doc["gens"].items())
    ]
    if not leafs:
        raise IOError(f"snapshot {seq} of {table_path} references no data")
    return spark.read.option("basePath", table_path).parquet(*leafs)


def _read_snapshot(
    spark: SparkSession, table_path: str
) -> DataFrame:
    """Snapshot-consistent read: resolve the generation pointer once and
    scan exactly the directories it names (basePath keeps the partition
    column + pruning). Falls back to a plain parquet read for legacy
    tables — the two layouts coexist (a half-migrated table also reads
    correctly: partition parsing skips the non-``k=v`` g_ level)."""
    ptr = _gen_pointer(spark, table_path)
    if ptr is None:
        return spark.read.parquet(table_path)
    _seq, part_col, gens = ptr
    leafs = [
        f"{table_path}/{part_col}={val}/{gen}" for val, gen in sorted(gens.items())
    ]
    if not leafs:
        raise IOError(
            f"generation pointer at {table_path} references no data "
            "(an all-buckets-deleted table whose root removal crashed; "
            "_gen_sweep repairs this at the next writer open)"
        )
    return spark.read.option("basePath", table_path).parquet(*leafs)


def _repair_nest_dirs(spark: SparkSession, table_path: str) -> None:
    """Roll back ``.__nest_*`` move-asides left by a migration killed
    between staging a partition dir and nesting it (the dirname embeds
    the destination, same contract as ``.__old_``): the aside holds the
    ONLY copy of that partition, so it is restored, never deleted."""
    if not hfs.exists(spark, table_path):
        return
    for name, _size, is_dir in hfs.listdir(spark, table_path):
        if not (is_dir and name.startswith(".__nest_")):
            continue
        aside = f"{table_path}/{name}"
        # .__nest_<12hex>_<part_col>=<k>
        frag = name[len(".__nest_") + 13:]
        dst = f"{table_path}/{frag}"
        if hfs.exists(spark, dst):
            if hfs.listdir(spark, dst):
                raise IOError(
                    f"migration repair: both {aside} and non-empty {dst} "
                    "exist; refusing to guess which is current"
                )
            hfs.delete(spark, dst)  # empty freshly-made dir
        if not hfs.rename(spark, aside, dst):
            raise IOError(f"migration repair: could not roll back {aside}")


def _gen_init_from_flat(
    spark: SparkSession, table_path: str, part_col: str = BUCKET_COL
) -> None:
    """One-time migration of a flat ``part_col=K/files`` layout into the
    generation layout: nest each partition's contents into a ``g_<run>``
    dir (renames only — bytes untouched), then publish pointer seq 0.
    Idempotent: partitions already holding a single g_ dir are adopted
    as-is, so a crash mid-migration just re-runs (and the half-migrated
    state stays readable via the legacy path meanwhile)."""
    _repair_nest_dirs(spark, table_path)
    run = uuid.uuid4().hex[:12]
    gens: dict[str, str] = {}
    for name, _size, is_dir in hfs.listdir(spark, table_path):
        if not (is_dir and name.startswith(f"{part_col}=")):
            continue
        part_dir = f"{table_path}/{name}"
        entries = hfs.listdir(spark, part_dir)
        subdirs = [n for n, _s, d in entries if d and n.startswith("g_")]
        if len(subdirs) == 1 and all(
            d and n.startswith("g_") for n, _s, d in entries
        ):
            gens[name.split("=", 1)[1]] = subdirs[0]  # already nested
            continue
        aside = f"{table_path}/.__nest_{run}_{name}"
        if not hfs.rename(spark, part_dir, aside):
            raise IOError(f"generation migration: could not stage {part_dir}")
        hfs.mkdirs(spark, part_dir)
        gen = f"g_{run}"
        if not hfs.rename(spark, aside, f"{part_dir}/{gen}"):
            # roll back so the legacy read stays whole
            hfs.delete(spark, part_dir)
            hfs.rename(spark, aside, part_dir)
            raise IOError(f"generation migration: could not nest {part_dir}")
        gens[name.split("=", 1)[1]] = gen
    _write_gen_pointer(spark, table_path, 0, part_col, gens)


def _swap_buckets(
    spark: SparkSession,
    table_path: str,
    merged: DataFrame,
    touched: list[int],
    part_col: str = BUCKET_COL,
) -> None:
    """Write ``merged`` (which carries ``part_col``) partitioned to a tmp
    dir, then swap ONLY the ``touched`` partition directories into the
    table — every untouched partition's files stay byte-identical on
    disk. ``part_col`` defaults to the hash-bucket layout; the ANN index
    reuses the same machinery over its ``centroid_id`` partitions.

    Each individual partition swap is an atomic rename; the sequence as a
    whole is not transactional, but the callers' MERGE/DELETE are
    idempotent (content-derived keys), so a crash mid-sequence is
    repaired by re-running the same operation — and a crash INSIDE one
    swap's move-aside window is rolled back by
    :func:`_sweep_stale_swap_dirs` (the ``.__old_`` name embeds the
    partition dirname so the sweep knows each dir's destination). Behind
    a real lakehouse catalog this function becomes Iceberg ``MERGE
    INTO`` commits.

    Tables carrying a generation pointer (all tables this module creates
    since r6; see the protocol comment above :func:`_gen_pointer`) take
    the snapshot-isolated path instead: stage immutable ``g_<run>`` dirs
    for the touched buckets, publish ONE new pointer file as the atomic
    commit point, then GC the replaced generations — a reader planning a
    scan anywhere in the sequence sees a single consistent snapshot.
    The legacy rename-swap below remains for pointer-less tables (the
    materialized ANN index, pre-r6 layouts)."""
    _sweep_stale_swap_dirs(spark, table_path)
    ptr = _gen_pointer(spark, table_path)
    if ptr is not None:
        seq, pcol, gens = ptr
        if pcol != part_col:
            raise IOError(
                f"generation pointer of {table_path} is keyed on {pcol}, "
                f"not {part_col}"
            )
        # (crashed writers' staged generations were swept by
        # _sweep_stale_swap_dirs above, guided by their intent files)
        run = uuid.uuid4().hex[:12]
        tmp = f"{table_path}.__tmp_{run}"
        merged.write.partitionBy(part_col).parquet(tmp)
        gen = f"g_{run}"
        new_gens = dict(gens)
        # commit intent BEFORE staging: names the touched partition dirs
        # so a crash anywhere below is swept in O(touched), not by
        # walking every bucket of the table
        intent_path = _write_intent(
            spark, table_path, run, part_col, [f"{part_col}={k}" for k in touched]
        )
        for k in touched:
            frag = f"{part_col}={k}"
            src = f"{tmp}/{frag}"
            if hfs.exists(spark, src):
                hfs.mkdirs(spark, f"{table_path}/{frag}")
                if not hfs.rename(spark, src, f"{table_path}/{frag}/{gen}"):
                    raise IOError(
                        f"generation commit: could not stage {src}"
                    )
                new_gens[str(k)] = gen
            else:
                new_gens.pop(str(k), None)  # bucket emptied by the MERGE
            if _TEST_MID_COMMIT_HOOK is not None:
                _TEST_MID_COMMIT_HOOK(k)
        hfs.delete(spark, tmp)
        retain = _gen_retain(spark, table_path)
        _write_gen_pointer(
            spark, table_path, seq + 1, part_col, new_gens, retain=retain
        )
        if retain == 0 or not new_gens:
            # post-commit GC — immediate, so exactly one generation per
            # bucket stays on disk between mutations (raw root reads see
            # no dupes). An emptied table GCs immediately even under
            # retention: delete-everything is terminal (DROP is not
            # snapshotted), keeping the caller's root-removal check and
            # the empty-gens sweep repair valid.
            for k in touched:
                frag = f"{part_col}={k}"
                old_gen = gens.get(str(k))
                if str(k) not in new_gens:
                    hfs.delete(spark, f"{table_path}/{frag}")
                elif old_gen is not None and old_gen != new_gens[str(k)]:
                    hfs.delete(spark, f"{table_path}/{frag}/{old_gen}")
            hfs.delete(spark, f"{table_path}/{_POINTER_PREFIX}{seq}.json")
        else:
            # retention: the replaced generations STAY — a reader that
            # resolved pointer `seq` before this commit keeps a valid
            # scan for `retain` more commits. Only snapshots past the
            # window are pruned (bounded: expired-touched buckets only).
            expire_snapshots(spark, table_path, keep_last=retain + 1)
        hfs.delete(spark, intent_path)  # GC complete: retire the intent
        return
    run = uuid.uuid4().hex
    tmp = f"{table_path}.__tmp_{run}"
    merged.write.partitionBy(part_col).parquet(tmp)
    for k in touched:
        frag = f"{part_col}={k}"
        src = f"{tmp}/{frag}"
        dst = f"{table_path}/{frag}"
        old = f"{table_path}.__old_{run}_{frag}"
        had = hfs.exists(spark, dst)
        if had and not hfs.rename(spark, dst, old):
            raise IOError(f"bucket swap: could not move aside {dst}")
        if hfs.exists(spark, src) and not hfs.rename(spark, src, dst):
            if had:
                hfs.rename(spark, old, dst)  # roll this bucket back
            raise IOError(f"bucket swap: could not commit {src} -> {dst}")
        if had:
            hfs.delete(spark, old)
    hfs.delete(spark, tmp)


def merge_upsert(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    num_buckets: int | None = None,
    replace_cols: tuple[str, ...] | None = None,
) -> None:
    """Emulated ``MERGE INTO table USING updates ON keys WHEN MATCHED
    UPDATE WHEN NOT MATCHED INSERT``. Idempotent: re-running with
    identical updates yields the same table (the reference gets this from
    FNV-1a content ids, store.rs:972-975).

    ``num_buckets=None``: legacy whole-table layout — kept = target ⟕̸
    updates (left anti), result = kept ∪ updates, one atomic directory
    swap. O(table) per MERGE.

    ``num_buckets=N``: **bucket-scoped MERGE** — the table lives as hive
    partitions ``__bucket=pmod(xxhash64(key), N)`` and an upsert rewrites
    ONLY the buckets containing updated keys: read those partitions
    (partition-pruned scan), anti-join ∪ updates within them, swap just
    those bucket directories. An incremental sync touching 0.1% of keys
    rewrites ~0.1% of the table instead of 100% of it — O(delta), the
    reference's point-upsert store (store.rs:373-434) re-expressed as a
    partitioned-table MERGE. A legacy unbucketed table is migrated to the
    bucketed layout on its first bucketed MERGE (one full rewrite).
    Buckets are keyed on ``key_cols[0]`` so composite-key tables (doc,
    line_no) co-locate with their doc-keyed manifest.

    ``replace_cols``: WHEN MATCHED **replace scope** — the anti-join that
    evicts old rows runs on these columns instead of the full key. The
    lines table passes ``("doc",)`` so re-embedding a SHRUNK document
    replaces ALL of its lines: under the full (doc, line_no) key, a doc
    going from 3 lines to 1 would keep its stale lines 1-2 forever (the
    reference replaces a document's points wholesale on upsert,
    store.rs:373-434). Must be a prefix of ``key_cols`` so bucketing is
    unaffected."""
    # repair BEFORE the target read: spark.read.parquet snapshots the file
    # listing at construction, so a crashed swap's rolled-back bucket must
    # be in place before the scan below is planned
    _sweep_stale_swap_dirs(spark, table_path)
    if replace_cols is not None and tuple(key_cols[: len(replace_cols)]) != tuple(
        replace_cols
    ):
        # a non-prefix replace scope would evict rows across the WRONG
        # buckets (bucketing keys on key_cols[0]) — silent data loss
        raise ValueError(
            f"replace_cols {replace_cols!r} must be a prefix of key_cols "
            f"{key_cols!r}: the eviction anti-join must stay within the "
            "buckets the update touches"
        )
    anti_cols = list(replace_cols or key_cols)
    if num_buckets is None:
        if hfs.exists(spark, table_path):
            target = _read_snapshot(spark, table_path)
            kept = target.join(
                updates.select(*anti_cols).distinct(), anti_cols, "left_anti"
            )
            merged = kept.unionByName(updates.select(*target.columns))
        else:
            merged = updates
        _atomic_overwrite(merged, table_path)
        return

    key = key_cols[0]
    upd = updates.withColumn(BUCKET_COL, _bucket_expr(key, num_buckets))
    existing = _bucket_ids(spark, table_path) if hfs.exists(spark, table_path) else []
    if not existing:
        if hfs.exists(spark, table_path) and hfs.listdir(spark, table_path):
            # legacy unbucketed table: one-time migration into the
            # bucketed layout (full rewrite, atomic whole-dir swap)
            target = _read_snapshot(spark, table_path)
            kept = target.join(
                updates.select(*anti_cols).distinct(), anti_cols, "left_anti"
            )
            merged = kept.unionByName(updates.select(*target.columns)).withColumn(
                BUCKET_COL, _bucket_expr(key, num_buckets)
            )
        else:
            merged = upd
        _atomic_overwrite(merged, table_path, partition_by=BUCKET_COL)
        # adopt the snapshot-isolated generation layout from day one
        # (renames only; subsequent MERGEs commit via the pointer)
        _gen_init_from_flat(spark, table_path)
        return

    touched = sorted(
        r[BUCKET_COL] for r in upd.select(BUCKET_COL).distinct().collect()
    )
    target = _read_snapshot(spark, table_path).filter(F.col(BUCKET_COL).isin(touched))
    kept = target.join(
        updates.select(*anti_cols).distinct(), anti_cols, "left_anti"
    )
    merged = kept.unionByName(upd.select(*kept.columns))
    _swap_buckets(spark, table_path, merged, touched)


def delete_keys(
    spark: SparkSession,
    table_path: str,
    keys: DataFrame,
    key_cols: tuple[str, ...],
    num_buckets: int | None = None,
) -> int:
    """W7: DELETE FROM table WHERE keys IN (...) via anti-join rewrite.
    Returns rows deleted. With ``num_buckets`` set and a bucketed table,
    only the buckets containing deleted keys are read and rewritten
    (O(delta), same contract as :func:`merge_upsert`)."""
    _sweep_stale_swap_dirs(spark, table_path)  # repair before the read (see merge_upsert)
    if not hfs.exists(spark, table_path):
        return 0
    bucketed = num_buckets is not None and _bucket_ids(spark, table_path)
    if not bucketed:
        target = _read_snapshot(spark, table_path)
        before = target.count()
        kept = target.join(
            keys.select(*key_cols).distinct(), list(key_cols), "left_anti"
        )
        n_kept = kept.count()
        _atomic_overwrite(kept, table_path)
        return before - n_kept

    key = key_cols[0]
    kb = keys.select(*key_cols).distinct().withColumn(
        BUCKET_COL, _bucket_expr(key, num_buckets)
    )
    touched = sorted(r[BUCKET_COL] for r in kb.select(BUCKET_COL).distinct().collect())
    if not touched:
        return 0
    target = _read_snapshot(spark, table_path).filter(F.col(BUCKET_COL).isin(touched))
    before = target.count()
    kept = target.join(kb.drop(BUCKET_COL), list(key_cols), "left_anti")
    n_kept = kept.count()
    _swap_buckets(spark, table_path, kept, touched)
    if not _bucket_ids(spark, table_path):
        # every bucket deleted → remove the (now schema-less) table root
        hfs.delete(spark, table_path)
    return before - n_kept


def _sweep_stale_swap_dirs(spark: SparkSession, table_path: str) -> None:
    """Repair-then-remove ``<table>.__tmp_*`` / ``<table>.__old_*`` left
    behind by a killed swap (single-writer assumption, same as the
    reference's store). Cheap: one parent-dir listing.

    NOT an unconditional delete: a crash between rename(dst→old) and
    rename(src→dst) — one such window per touched bucket in
    :func:`_swap_buckets`, and one for the whole table in
    :func:`_atomic_overwrite` — leaves the ONLY copy of that bucket's
    non-updated rows in the ``.__old_*`` dir. An ``.__old_*`` whose
    destination (bucket dir, or the table root for the whole-table form)
    is MISSING is therefore rolled BACK into place, restoring the
    pre-swap snapshot; the idempotent MERGE/DELETE re-run then redoes
    the swap. Only ``.__old_*`` dirs whose destination exists (crash
    after commit, before cleanup) are orphans and deleted. ``.__tmp_*``
    dirs are always safe to drop — rollback, not roll-forward, is the
    repair story."""
    import re

    parent, _, base = table_path.rstrip("/").rpartition("/")
    if not parent:
        return
    # .__old_<32-hex uuid> = whole-table move-aside (_atomic_overwrite);
    # .__old_<32-hex uuid>_<col>=<k> = one partition's move-aside
    # (_swap_buckets — the embedded dirname IS the rollback destination);
    # .__old_<32-hex uuid>_<k> = pre-r5 bucket move-aside (legacy name)
    old_re = re.compile(re.escape(base) + r"\.__old_[0-9a-f]{32}(?:_(.+))?$")
    tmps: list[str] = []
    for name, _size, _isdir in hfs.listdir(spark, parent):
        full = f"{parent}/{name}"
        if name.startswith(f"{base}.__tmp_"):
            tmps.append(full)
            continue
        m = old_re.match(name)
        if m is None:
            continue
        frag = m.group(1)
        if frag is None:
            dst = table_path
        elif "=" in frag:
            dst = f"{table_path}/{frag}"
        else:  # legacy bare-bucket-id name
            dst = f"{table_path}/{BUCKET_COL}={frag}"
        if not hfs.exists(spark, dst):
            if frag is not None:
                hfs.mkdirs(spark, table_path)  # all-buckets-deleted edge
            if not hfs.rename(spark, full, dst):
                raise IOError(
                    f"swap repair: could not roll back {full} -> {dst}; "
                    "refusing to continue (deleting it would lose the only "
                    "copy of that bucket's rows)"
                )
        else:
            hfs.delete(spark, full)
    for t in tmps:
        hfs.delete(spark, t)
    # generation-layout repairs: crashed migrations roll back, crashed
    # commits' staged (unreferenced) generations are dropped
    _repair_nest_dirs(spark, table_path)
    _gen_sweep(spark, table_path)


def _atomic_overwrite(
    df: DataFrame, table_path: str, partition_by: str | None = None
) -> None:
    """Write-then-swap via FS rename so readers never see a half-written
    table and a killed job leaves the old snapshot intact (the resume
    unit). Runs on any Hadoop filesystem; rename is atomic on HDFS and
    local FS (object stores: see fs.py caveat). Stale swap dirs from a
    previously killed writer are swept first."""
    spark = df.sparkSession
    _sweep_stale_swap_dirs(spark, table_path)
    tmp = f"{table_path}.__tmp_{uuid.uuid4().hex}"
    writer = df.write.mode("overwrite")
    if partition_by is not None:
        writer = writer.partitionBy(partition_by)
    writer.parquet(tmp)
    old = f"{table_path}.__old_{uuid.uuid4().hex}"
    had_prior = hfs.exists(spark, table_path)
    if had_prior and not hfs.rename(spark, table_path, old):
        hfs.delete(spark, tmp)
        raise IOError(f"atomic overwrite: could not move {table_path} aside")
    if not hfs.rename(spark, tmp, table_path):
        # roll the old snapshot back so the table stays readable
        if had_prior:
            hfs.rename(spark, old, table_path)
        hfs.delete(spark, tmp)
        raise IOError(f"atomic overwrite: could not commit {tmp} -> {table_path}")
    if had_prior:
        hfs.delete(spark, old)


class Workspace:
    """Persistent line-embedding store with incremental maintenance —
    the `semtools workspace` analog. Tables under ``root``:

      doc_manifest:    (doc, size_bytes, mtime, _version)
      line_embeddings: (doc, line_no, line, embedding)
      workspace.json:  {dim, seed, _version} persisted config (W10,
                       reference workspace/mod.rs:8-25,33-101) — embedding
                       params live WITH the store, so reopening with
                       mismatched params fails loudly instead of silently
                       scoring against incompatible stored vectors.
    """

    CONFIG_FILE = "workspace.json"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        dim: int | None = None,
        seed: int | None = None,
        n_buckets: int | None = None,
        expected_table_bytes: int | None = None,
        lease_ttl_sec: int = DEFAULT_LEASE_TTL_SEC,
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.last_search_index_type: str | None = None
        self.lease_ttl_sec = lease_ttl_sec
        self._writer_token = uuid.uuid4().hex
        self._lease_depth = 0
        hfs.mkdirs(spark, self.root)
        cfg = self._load_config()
        if cfg is not None:
            for name, want in (("dim", dim), ("seed", seed)):
                if want is not None and want != cfg[name]:
                    raise ValueError(
                        f"workspace at {root} was created with {name}="
                        f"{cfg[name]}; reopening with {name}={want} would "
                        f"mismatch the stored embeddings (delete the "
                        f"workspace or omit {name} to use the stored value)"
                    )
            self.dim = cfg["dim"]
            self.seed = cfg["seed"]
            # pre-r4 workspaces carry no n_buckets: 16 triggers the
            # one-time legacy→bucketed migration on their next MERGE
            self.n_buckets = cfg.get("n_buckets", 16)
        else:
            # A populated workspace with NO config is corruption (e.g. a
            # crashed config rewrite, or a hand-deleted file): adopting the
            # caller's dim/seed here would silently score future queries
            # against incompatible stored vectors — refuse instead.
            if hfs.exists(spark, self.manifest_path) or hfs.exists(
                spark, self.lines_path
            ):
                raise IOError(
                    f"workspace at {root} has data tables but no "
                    f"{self.CONFIG_FILE}: refusing to adopt new embedding "
                    f"params over existing vectors (restore the config or "
                    f"delete the workspace)"
                )
            self.dim = 64 if dim is None else dim
            self.seed = DEFAULT_SEED if seed is None else seed
            if n_buckets is not None:
                self.n_buckets = n_buckets
            elif expected_table_bytes is not None:
                # size the MERGE unit to the table, not a constant: 16
                # buckets at 100 TB means every touched bucket rewrites
                # ~6 TB — "O(delta)" in name only (VERDICT r4 wrong #4)
                self.n_buckets = buckets_for_bytes(expected_table_bytes)
            else:
                self.n_buckets = 16
            self._save_config()
        # open-time repair: a crashed swap's moved-aside bucket must be
        # rolled back before the FIRST read, not just the first mutation.
        # SKIPPED while a live foreign lease exists: those .__old_/.__tmp_
        # dirs belong to a writer mid-swap, and "repairing" them would
        # roll its in-flight commit back out from under it (its next
        # rename(src, dst) fails on the resurrected dst). A live writer
        # needs no repair; a crashed one's lease expires, and the first
        # open (or mutation) after that repairs as before.
        if not self._foreign_lease_live():
            for p in (self.manifest_path, self.lines_path):
                _sweep_stale_swap_dirs(spark, p)
            # workspace-snapshot tmp files from a crashed publish
            for name, _s, is_dir in hfs.listdir(spark, self.root):
                if not is_dir and name.startswith(".__wsnap_tmp_"):
                    hfs.delete(spark, f"{self.root}/{name}")
            # crash-interrupted rebucket: the intent journal survives;
            # finish the migration before anything reads with the stale
            # bucket count
            self._recover_rebucket()

    @classmethod
    def resolve(
        cls,
        spark: SparkSession,
        name: str | None = None,
        base_dir: str | None = None,
        **kwargs,
    ) -> "Workspace":
        """W10 resolve: active workspace by name → $SEMTOOLS_WORKSPACE →
        'default', rooted under base_dir → $SEMTOOLS_BASE_DIR →
        ~/.semtools_spark/workspaces (reference workspace/mod.rs:33-101)."""
        name = name or os.environ.get("SEMTOOLS_WORKSPACE") or "default"
        base = base_dir or os.environ.get("SEMTOOLS_BASE_DIR") or os.path.join(
            os.path.expanduser("~"), ".semtools_spark", "workspaces"
        )
        return cls(spark, os.path.join(base, name), **kwargs)

    def _config_path(self) -> str:
        return f"{self.root}/{self.CONFIG_FILE}"

    def _load_config(self) -> dict | None:
        import json

        text = hfs.read_text(self.spark, self._config_path())
        return None if text is None else json.loads(text)

    def _save_config(self) -> None:
        import json

        cfg_path = self._config_path()
        tmp = cfg_path + f".tmp_{uuid.uuid4().hex}"
        hfs.write_text(
            self.spark,
            tmp,
            json.dumps(
                {
                    "dim": self.dim,
                    "seed": self.seed,
                    "n_buckets": self.n_buckets,
                    "_version": CURRENT_EMBEDDING_VERSION,
                }
            ),
        )
        # Rename-FIRST: succeeds when no destination exists (the common
        # case — the config is written once at creation). Only on refusal
        # (a prior config present) move the old file aside, commit, then
        # drop the old copy — at every crash point either the old or the
        # new config is at cfg_path, so the dim/seed mismatch guard never
        # silently disappears (a delete-then-rename window would leave a
        # configless workspace whose next open adopts the caller's params
        # against incompatible stored vectors).
        if not hfs.rename(self.spark, tmp, cfg_path):
            old = cfg_path + f".old_{uuid.uuid4().hex}"
            if not hfs.rename(self.spark, cfg_path, old):
                hfs.delete(self.spark, tmp)
                raise IOError(f"could not move aside old config at {cfg_path}")
            if not hfs.rename(self.spark, tmp, cfg_path):
                hfs.rename(self.spark, old, cfg_path)  # roll back
                hfs.delete(self.spark, tmp)
                raise IOError(f"could not commit workspace config at {cfg_path}")
            hfs.delete(self.spark, old)

    # ---- workspace-level snapshot (multi-table atomicity) ----------------
    # One mutation commits lines THEN manifest — two per-table commit
    # points. Without anything above them, a reader between the two pairs
    # a new lines snapshot with the old manifest (each internally
    # consistent, jointly one mutation apart — the documented r6
    # limitation). The workspace snapshot closes it: every mutation ends
    # by atomically publishing ``_wsnap.<seq>.json`` naming BOTH tables'
    # pointer sequences, and every read resolves the wsnap and reads each
    # table AT its pinned sequence. The pinned (pre-mutation) table
    # snapshots stay on disk because workspace tables carry
    # ``retain >= 1`` (set once, lazily, before the first wsnap-guarded
    # mutation) — so the pin survives the in-flight mutation and one full
    # subsequent one, the same residual-long-scan contract as table-level
    # retention. This is the two-table analog of what a real catalog's
    # multi-table transactions would provide.
    WSNAP_PREFIX = "_wsnap."
    _WSNAP_TABLES = (("manifest", "manifest_path"), ("lines", "lines_path"))

    def _wsnap_seqs(self) -> list[int]:
        seqs: list[int] = []
        for name, _s, is_dir in hfs.listdir(self.spark, self.root):
            if is_dir or not (
                name.startswith(self.WSNAP_PREFIX) and name.endswith(".json")
            ):
                continue
            try:
                seqs.append(int(name[len(self.WSNAP_PREFIX):-len(".json")]))
            except ValueError:
                continue
        return sorted(seqs)

    def _wsnap(self, _retry: int = 2) -> "tuple[int, dict] | None":
        import json

        seqs = self._wsnap_seqs()
        if not seqs:
            return None
        text = hfs.read_text(
            self.spark, f"{self.root}/{self.WSNAP_PREFIX}{seqs[-1]}.json"
        )
        if text is None:
            if _retry > 0:  # pruned between list and read: re-list
                return self._wsnap(_retry - 1)
            for s in reversed(seqs[:-1]):  # degrade: next-newest readable
                text = hfs.read_text(
                    self.spark, f"{self.root}/{self.WSNAP_PREFIX}{s}.json"
                )
                if text is not None:
                    return s, json.loads(text)
            return None  # no readable wsnap: callers fall back per-table
        return seqs[-1], json.loads(text)

    def _publish_wsnap(self) -> None:
        """Atomically publish the workspace snapshot pinning every
        table's CURRENT pointer sequence (None = table absent). Called
        under the lease at the end of each mutation — the single commit
        point readers pair tables by."""
        import json

        pins: dict = {}
        for key, attr in self._WSNAP_TABLES:
            ptr = _gen_pointer(self.spark, getattr(self, attr))
            pins[key] = None if ptr is None else ptr[0]
        prev = self._wsnap()
        seq = (prev[0] if prev is not None else -1) + 1
        tmp = f"{self.root}/.__wsnap_tmp_{uuid.uuid4().hex}"
        hfs.write_text(self.spark, tmp, json.dumps({"tables": pins}))
        dst = f"{self.root}/{self.WSNAP_PREFIX}{seq}.json"
        if not hfs.rename(self.spark, tmp, dst):
            hfs.delete(self.spark, tmp)
            raise IOError(f"workspace snapshot: could not publish {dst}")
        for s in self._wsnap_seqs():
            if s < seq:
                hfs.delete(self.spark, f"{self.root}/{self.WSNAP_PREFIX}{s}.json")

    def _ensure_table_retention(self, publish: bool = True) -> None:
        """Raise each pointer table to ``retain >= 1`` so the snapshots a
        wsnap pins outlive the mutation replacing them. Runs BEFORE the
        mutation's first table commit; a one-time metadata commit per
        table, no-op afterwards. User-raised retention is respected.
        Also re-run at mutation END (before the wsnap publish) so tables
        CREATED by this mutation get their bump immediately — otherwise
        the next mutation's bump would be an extra pointer commit sitting
        between the crash-injection points the durability tests pin.

        When a bump happened, the wsnap is immediately re-published over
        the bumped sequences: the bump itself consumes one slot of the
        retention window (it is a pointer commit, albeit over the same
        generations), so a wsnap still pinning the PRE-bump sequence
        would be expired by the very next data commit. End-of-mutation
        callers pass ``publish=False`` — their own ``_publish_wsnap``
        immediately follows and pins the bumped sequences anyway.

        Consequences of the bump, stated rather than silent: workspace
        tables keep ONE superseded snapshot per bucket on disk, so (a)
        reading the parquet ROOT directly (bypassing the pointer) sees
        duplicate rows — go through ``manifest()``/``lines()`` or
        :func:`read_snapshot`, as the module docs already require for
        mid-commit consistency; and (b) deleted document content
        survives one extra mutation before GC — run
        :func:`expire_snapshots` (or any further mutation) after a
        delete when prompt physical removal matters. Cross-table
        pairing (the wsnap contract) requires the pinned snapshots to
        outlive the mutation replacing them, so this is not optional
        per-table; user-RAISED retention is respected."""
        bumped = False
        for _key, attr in self._WSNAP_TABLES:
            path = getattr(self, attr)
            if (
                hfs.exists(self.spark, path)
                and _gen_pointer(self.spark, path) is not None
                and _gen_retain(self.spark, path) == 0
            ):
                set_snapshot_retention(self.spark, path, 1)
                bumped = True
        if bumped and publish:
            self._publish_wsnap()

    def _snapshot_table(self, path: str, key: str) -> DataFrame | None:
        """Wsnap-pinned read of one table (bucket column kept). Falls
        back to the table's own current pointer when no wsnap exists
        (legacy workspace) or the pin has expired under a slow reader."""
        snap = self._wsnap()
        if snap is not None:
            seq = snap[1].get("tables", {}).get(key)
            if seq is None:
                return None
            try:
                return read_snapshot(self.spark, path, seq=seq)
            except Exception:
                # expired pin. Not just IOError: expire_snapshots deletes
                # generation dirs BEFORE pointer files, so a reader in
                # that window resolves the pointer but the leaf scan
                # raises AnalysisException (PATH_NOT_FOUND) — either way
                # the designed degrade is the table's current pointer
                pass
        if not hfs.exists(self.spark, path):
            return None
        return _read_snapshot(self.spark, path)

    # ---- single-writer lease --------------------------------------------
    LEASE_FILE = "_writer.lock"

    def _lease_path(self) -> str:
        return f"{self.root}/{self.LEASE_FILE}"

    #: heartbeat files ``_writer.hb_<token>_<ns>`` — the timestamp lives
    #: in the NAME, so renewal is one uniquely-named atomic create (no
    #: rewrite-in-place window during which the lease could look absent)
    HB_PREFIX = "_writer.hb_"

    def _hb_ts(self, token: str) -> float:
        """Latest heartbeat timestamp for ``token`` (0.0 if none)."""
        best = 0.0
        pre = f"{self.HB_PREFIX}{token}_"
        for name, _size, is_dir in hfs.listdir(self.spark, self.root):
            if is_dir or not name.startswith(pre):
                continue
            try:
                best = max(best, int(name[len(pre):]) / 1e9)
            except ValueError:
                pass
        return best

    def _drop_heartbeats(self, token: str) -> None:
        pre = f"{self.HB_PREFIX}{token}_"
        for name, _size, is_dir in hfs.listdir(self.spark, self.root):
            if not is_dir and name.startswith(pre):
                hfs.delete(self.spark, f"{self.root}/{name}")

    def _heartbeat(self) -> None:
        """Renew the held lease mid-mutation (ADVICE r5: a mutation whose
        Spark jobs outlive ``lease_ttl_sec`` would otherwise go stale
        in-flight and be reclaimed by a second writer). Called between
        the heavy stages of sync/delete/prune/rebucket/index builds;
        writes a fresh uniquely-named heartbeat, then drops our older
        ones — at every instant at least one of lease/heartbeat carries
        a recent timestamp, so liveness probes never see a gap."""
        if self._lease_depth == 0:
            return
        import time

        hfs.write_text(
            self.spark,
            f"{self.root}/{self.HB_PREFIX}{self._writer_token}_{time.time_ns()}",
            "",
        )
        pre = f"{self.HB_PREFIX}{self._writer_token}_"
        names = sorted(
            name
            for name, _size, is_dir in hfs.listdir(self.spark, self.root)
            if not is_dir and name.startswith(pre)
        )
        for name in names[:-1]:
            hfs.delete(self.spark, f"{self.root}/{name}")

    def _effective_lease_ts(self, cur: dict) -> float:
        """A lease's liveness timestamp: its claim-time stamp, or any
        later heartbeat its holder wrote during a long mutation."""
        base = float(cur.get("ts", 0.0))
        token = cur.get("token")
        return max(base, self._hb_ts(token)) if token else base

    def _foreign_lease_live(self) -> bool:
        """True iff another writer's lease exists and is within TTL —
        the guard that keeps open-time repair from rolling back a live
        writer's in-flight swap."""
        import json
        import time

        text = hfs.read_text(self.spark, self._lease_path())
        if text is None:
            return False
        try:
            cur = json.loads(text)
        except ValueError:
            return False  # torn write = crashed writer
        if cur.get("token") == self._writer_token:
            return False
        return (time.time() - self._effective_lease_ts(cur)) < self.lease_ttl_sec

    def _lease(self):
        """Context manager claiming the workspace's writer lease for one
        public mutation (sync/delete/prune/build_ann_index/rebucket).

        The bucket-swap protocol is single-writer by design; until r4
        that was only a docstring. The lease makes a second concurrent
        writer FAIL LOUDLY instead of corrupting the swap sequence:
        ``_writer.lock`` holds {host, pid, ts, token}; a claim finds
        either no lease, OUR token (re-entrant), a stale lease (ts older
        than ``lease_ttl_sec`` — presumed-crashed writer, reclaimed), or
        a live foreign lease → :class:`ConcurrentWriterError`. The claim
        itself is Hadoop ``create(overwrite=false)`` — the namenode
        arbitrates, so two writers racing for a reclaimed lease resolve
        to exactly one winner on HDFS/local (object stores: conditional
        PUTs exist but not through this API; front with a catalog).
        Reclaiming a stale lease is ALSO atomic (ADVICE r5): the stale
        file is renamed to a unique tombstone first — exactly one of N
        racing reclaimers wins that rename; the losers get
        :class:`ConcurrentWriterError` instead of deleting the winner's
        freshly-claimed lease out from under it. Long mutations renew
        the lease via :meth:`_heartbeat` between heavy stages, so a
        sync whose Spark jobs outlive the TTL does not go stale
        in-flight; staleness is judged on max(claim ts, heartbeat ts).

        This is crash-detection, not a distributed lock service: clock
        skew between writers eats into the TTL, which is why the default
        is 15 min, not seconds."""
        import contextlib
        import json
        import socket
        import time

        @contextlib.contextmanager
        def _ctx():
            path = self._lease_path()
            if self._lease_depth == 0:
                now = time.time()
                text = hfs.read_text(self.spark, path)
                if text is not None:
                    try:
                        cur = json.loads(text)
                    except ValueError:
                        cur = {"token": None, "ts": 0.0}  # torn write = crashed writer
                    if cur.get("token") != self._writer_token:
                        age = now - self._effective_lease_ts(cur)
                        if age < self.lease_ttl_sec:
                            raise ConcurrentWriterError(
                                f"workspace {self.root} is being written by "
                                f"{cur.get('host')}:{cur.get('pid')} (lease age "
                                f"{age:.0f}s < ttl {self.lease_ttl_sec}s)"
                            )
                        # stale: reclaim via atomic rename-to-tombstone —
                        # of N racing reclaimers exactly one wins this
                        # rename; a delete here would blow away a lease
                        # another reclaimer just created (ADVICE r5)
                        tomb = f"{path}.tomb_{uuid.uuid4().hex}"
                        if not hfs.rename(self.spark, path, tomb):
                            raise ConcurrentWriterError(
                                f"lost the stale-lease reclaim race for "
                                f"workspace {self.root}"
                            )
                        hfs.delete(self.spark, tomb)
                        if cur.get("token"):
                            self._drop_heartbeats(cur["token"])
                    else:
                        # re-stamp our own — same atomic move-aside: if
                        # the rename fails, our stale lease was already
                        # reclaimed by another writer and we no longer
                        # hold the workspace
                        tomb = f"{path}.tomb_{uuid.uuid4().hex}"
                        if not hfs.rename(self.spark, path, tomb):
                            raise ConcurrentWriterError(
                                f"our lease on workspace {self.root} was "
                                f"reclaimed by another writer"
                            )
                        hfs.delete(self.spark, tomb)
                claimed = hfs.create_exclusive(
                    self.spark,
                    path,
                    json.dumps(
                        {
                            "host": socket.gethostname(),
                            "pid": os.getpid(),
                            "ts": now,
                            "token": self._writer_token,
                        }
                    ),
                )
                if not claimed:
                    raise ConcurrentWriterError(
                        f"lost the lease race for workspace {self.root}"
                    )
            self._lease_depth += 1
            try:
                yield
            finally:
                self._lease_depth -= 1
                if self._lease_depth == 0:
                    # best-effort release; a crash here just leaves a
                    # lease that expires after ttl
                    text = hfs.read_text(self.spark, path)
                    if text is not None:
                        try:
                            if json.loads(text).get("token") == self._writer_token:
                                hfs.delete(self.spark, path)
                        except ValueError:
                            pass
                    self._drop_heartbeats(self._writer_token)

        return _ctx()

    # ---- bucket-count migration ----------------------------------------
    REBUCKET_FILE = "_rebucket.json"

    def _rebucket_journal_path(self) -> str:
        return f"{self.root}/{self.REBUCKET_FILE}"

    def rebucket(self, n_buckets: int) -> None:
        """One-time migration to a new bucket count (VERDICT r4 wrong #4:
        a bucket count fixed at creation can't follow table growth — at
        100 TB a 16-bucket table rewrites ≥6 TB per touched bucket).

        Crash-safe via an intent journal: the journal is written first,
        both tables are rewritten under the new ``pmod(xxhash64(doc), n)``
        layout (each an atomic whole-table swap), the config is updated,
        then the journal is dropped. A crash anywhere after the journal
        is finished by :meth:`_recover_rebucket` at the next open — the
        rewrite is layout-agnostic and idempotent, so re-running it over
        a half-migrated pair of tables converges. Without the journal, a
        crash between the table rewrite and the config save would leave
        MERGE computing touched-bucket ids under the WRONG modulus —
        updates land beside their keys instead of on them, and the
        anti-join stops deduplicating."""
        import json

        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        with self._lease():
            jp = self._rebucket_journal_path()
            tmp = jp + f".tmp_{uuid.uuid4().hex}"
            hfs.write_text(self.spark, tmp, json.dumps({"n_buckets": n_buckets}))
            if not hfs.rename(self.spark, tmp, jp):
                hfs.delete(self.spark, tmp)
                raise IOError(f"could not journal rebucket at {jp}")
            self._do_rebucket(n_buckets)
            hfs.delete(self.spark, jp)

    def _recover_rebucket(self) -> None:
        import json

        text = hfs.read_text(self.spark, self._rebucket_journal_path())
        if text is None:
            return
        n = json.loads(text)["n_buckets"]
        with self._lease():
            self._do_rebucket(n)
            hfs.delete(self.spark, self._rebucket_journal_path())

    def _do_rebucket(self, n_buckets: int) -> None:
        for path in (self.manifest_path, self.lines_path):
            _sweep_stale_swap_dirs(self.spark, path)
            if not hfs.exists(self.spark, path):
                continue
            df = _read_snapshot(self.spark, path)
            if BUCKET_COL in df.columns:
                df = df.drop(BUCKET_COL)
            df = df.withColumn(BUCKET_COL, _bucket_expr("doc", n_buckets))
            _atomic_overwrite(df, path, partition_by=BUCKET_COL)
            _gen_init_from_flat(self.spark, path)
            self._heartbeat()  # one full-table rewrite per table: renew
        self.n_buckets = n_buckets
        self._save_config()
        # the rewrite reset each table's pointer history (seq 0, no
        # retention): re-raise retention and re-pin the wsnap to the new
        # sequences so reads don't fall back mid-window
        self._ensure_table_retention(publish=False)
        self._publish_wsnap()

    @property
    def manifest_path(self) -> str:
        return f"{self.root}/doc_manifest.parquet"

    @property
    def lines_path(self) -> str:
        return f"{self.root}/line_embeddings.parquet"

    def _read_table(self, path: str, key: str) -> DataFrame | None:
        # the bucket partition column is physical layout, not data; the
        # wsnap-pinned read pairs this table's snapshot with the OTHER
        # table's from the same mutation, so cross-table reads are one
        # consistent workspace state even while a writer is mid-mutation
        df = self._snapshot_table(path, key)
        return None if df is None else df.drop(BUCKET_COL)

    def manifest(self) -> DataFrame | None:
        return self._read_table(self.manifest_path, "manifest")

    def lines(self) -> DataFrame | None:
        return self._read_table(self.lines_path, "lines")

    # ---- W1-W4: incremental sync --------------------------------------
    def sync(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        mtime_col: str | None = None,
    ) -> dict[str, int]:
        """Classify docs vs the manifest, (re-)embed only New ∪ Changed
        lines, MERGE both tables. Returns state counts (the reference's
        workspace-mode search driver, search/mod.rs:146-216)."""
        with self._lease():
            self._ensure_table_retention()
            meta = docs.select(
                F.col(id_col).alias("doc"),
                F.length(text_col).cast("long").alias("size_bytes"),
                (F.col(mtime_col) if mtime_col else F.lit(0)).cast("long").alias("mtime"),
            )
            states = classify_states(meta, self.manifest(), key="doc")
            counts = {
                r["state"]: r["n"]
                for r in states.groupBy("state").agg(F.count("*").alias("n")).collect()
            }
            todo = states.filter(
                F.col("state").isin(STATE_NEW, STATE_CHANGED)
            ).select("doc")
            if counts.get(STATE_NEW, 0) + counts.get(STATE_CHANGED, 0) > 0:
                # a fresh ANN index is maintained THROUGH the sync (delta
                # re-assignment, see _ann_index_apply_delta) — the old
                # lines' centroid set must be captured pre-merge
                index_maintain = self.ann_index_fresh()
                old_centroids: list[int] = []
                if index_maintain:
                    # cut todo's lineage: it reads the manifest, which the
                    # MERGE below atomically swaps — a lazy re-evaluation
                    # in the post-merge delta step would chase vanished
                    # files (O(delta) single-column materialization)
                    todo = todo.localCheckpoint()
                    old_centroids = self._ann_delta_centroids(todo)
                docs_todo = docs.join(
                    F.broadcast(todo), docs[id_col] == todo["doc"], "left_semi"
                )
                lines = split_lines(docs_todo, id_col=id_col, text_col=text_col)
                emb = lines.withColumn(
                    "embedding", embed_udf(dim=self.dim, seed=self.seed)(F.col("line"))
                )
                # replace_cols=("doc",): a changed doc's lines are replaced
                # WHOLESALE — under the full key a shrunk doc would keep
                # its stale tail lines forever (store.rs:373-434 replaces
                # a document's points on upsert)
                merge_upsert(
                    self.spark, self.lines_path, emb, ("doc", "line_no"),
                    num_buckets=self.n_buckets, replace_cols=("doc",),
                )
                # the embed+merge above is the long pole of a big sync —
                # renew the lease so it cannot go stale mid-mutation
                self._heartbeat()
                man_updates = meta.join(
                    F.broadcast(todo), "doc", "left_semi"
                ).withColumn("_version", F.lit(CURRENT_EMBEDDING_VERSION))
                merge_upsert(
                    self.spark, self.manifest_path, man_updates, ("doc",),
                    num_buckets=self.n_buckets,
                )
                if index_maintain:
                    self._heartbeat()
                    self._ann_index_apply_delta(todo, old_centroids)
                self._ensure_table_retention(publish=False)
                self._publish_wsnap()
            return counts

    # ---- persistent ANN index (reference persists HNSW and reuses it
    # across queries, store.rs:146-177; ours is IVF inverted lists) ------
    @property
    def ann_index_path(self) -> str:
        return f"{self.root}/ann_index"

    def _lines_fingerprint(self) -> str:
        """Identity of the lines table CONTENT the index was built from:
        the per-leaf listings of the current pointer's generation dirs
        (immutable once written). Deliberately NOT a whole-root listing —
        with snapshot retention, pruning an old generation or a
        metadata-only pointer bump would change a root listing without
        changing the data, spuriously marking the index stale."""
        import hashlib
        import json

        ptr = _gen_pointer(self.spark, self.lines_path)
        if ptr is None:
            payload = hfs.listing(self.spark, self.lines_path)
        else:
            _seq, part_col, gens = ptr
            payload = {
                f"{part_col}={v}/{g}": hfs.listing(
                    self.spark, f"{self.lines_path}/{part_col}={v}/{g}"
                )
                for v, g in sorted(gens.items())
            }
        return hashlib.md5(json.dumps(payload).encode()).hexdigest()

    def build_ann_index(
        self,
        n_centroids: int = 8,
        trained: bool = False,
        max_sample: int = 50_000,
    ) -> dict:
        """Materialize IVF inverted lists over the stored line embeddings
        (hive partitions ``centroid_id=K`` + codebook sidecar), stamped
        with a fingerprint of the lines table — a later sync makes the
        index STALE and search falls back to exact rather than silently
        missing the new lines. ``trained=True`` fits a spherical-kmeans
        codebook on a bounded sample first."""
        from semtools_spark.operators.similarity import (
            ivf_build_index,
            ivf_train_centroids,
        )

        with self._lease():
            lines = self.lines()
            if lines is None:
                raise ValueError("cannot index an empty workspace — sync first")
            cents = None
            if trained:
                cents = ivf_train_centroids(
                    lines, n_centroids=n_centroids, dim=self.dim, seed=self.seed,
                    max_sample=max_sample,
                )
            ivf_build_index(
                lines, self.ann_index_path, n_centroids=n_centroids, dim=self.dim,
                seed=self.seed, vec_col="embedding", centroids=cents,
            )
            # a rebuild SUPERSEDES any crashed incremental delta: its
            # .__old_/.__tmp_ leftovers must be deleted, NOT repaired —
            # rolling a stale inverted list back into a fresh index would
            # resurrect evicted lines
            parent, _, base = self.ann_index_path.rstrip("/").rpartition("/")
            for name, _size, _isdir in hfs.listdir(self.spark, parent):
                if name.startswith((f"{base}.__tmp_", f"{base}.__old_")):
                    hfs.delete(self.spark, f"{parent}/{name}")
            import json

            hfs.write_text(
                self.spark,
                f"{self.ann_index_path}/_source_fingerprint.json",
                json.dumps({"lines_md5": self._lines_fingerprint()}),
            )
            return {"n_centroids": n_centroids, "trained": trained}

    def ann_index_fresh(self) -> bool:
        import json

        text = hfs.read_text(
            self.spark, f"{self.ann_index_path}/_source_fingerprint.json"
        )
        if text is None:
            return False
        # a fingerprint can outlive its table (delete() removes the lines
        # root when every bucket empties): an absent table is STALE, not
        # a listing crash inside stats()/search()
        if not hfs.exists(self.spark, self.lines_path):
            return False
        return json.loads(text)["lines_md5"] == self._lines_fingerprint()

    # ---- incremental index maintenance (VERDICT r4 next #4) ------------
    def _lines_of_docs(self, keys: DataFrame) -> DataFrame | None:
        """Bucket-pruned, O(delta) read of the stored lines of the given
        doc keys: the key set's bucket ids (≤ n_buckets ints) become a
        partition filter, then a broadcast semi-join selects the docs."""
        if not hfs.exists(self.spark, self.lines_path):
            return None
        stored = _read_snapshot(self.spark, self.lines_path)
        if _bucket_ids(self.spark, self.lines_path):
            buckets = [
                r["b"]
                for r in keys.select(
                    _bucket_expr("doc", self.n_buckets).alias("b")
                ).distinct().collect()
            ]
            stored = stored.filter(F.col(BUCKET_COL).isin(buckets))
        if BUCKET_COL in stored.columns:
            stored = stored.drop(BUCKET_COL)
        return stored.join(F.broadcast(keys.select("doc")), "doc", "left_semi")

    def _ann_delta_centroids(self, todo: DataFrame) -> list[int]:
        """Centroid ids holding the CURRENT (pre-merge) lines of the delta
        docs — captured before the MERGE because those embeddings are the
        only way to know which inverted lists must evict them. Assignment
        re-runs the index's own codebook, so it reproduces exactly the
        list each line was built into."""
        from semtools_spark.operators.similarity import ivf_assign, ivf_read_meta

        old = self._lines_of_docs(todo)
        if old is None:
            return []
        meta = ivf_read_meta(self.spark, self.ann_index_path)
        assigned = ivf_assign(
            old, n_centroids=meta["n_centroids"], dim=meta["dim"],
            seed=meta["seed"], vec_col="embedding", centroids=meta["centroids"],
        )
        return sorted(
            r["centroid_id"]
            for r in assigned.select("centroid_id").distinct().collect()
        )

    def _ann_index_apply_delta(self, todo: DataFrame, old_centroids: list[int]) -> None:
        """Re-assign ONLY the delta docs' (post-mutation) lines and swap
        just the touched ``centroid_id=K`` partitions of the materialized
        index — the reference maintains its HNSW incrementally on
        upsert/delete (store.rs:235-434); r4's index went STALE on every
        mutation and fell back to exact. Serves sync (evict old lines +
        insert re-embedded ones) AND delete/prune (pure eviction: the
        deltas' lines are gone from the table, so only the old-centroid
        partitions rewrite). Untouched inverted lists stay byte-identical
        on disk (same `_swap_buckets` machinery as the tables). The
        source fingerprint is re-stamped LAST: a crash anywhere mid-delta
        leaves a fingerprint that no longer matches the mutated lines
        table, so search falls back to exact rather than reading a
        half-updated index."""
        import json

        from semtools_spark.operators.similarity import ivf_assign, ivf_read_meta

        if not hfs.exists(self.spark, self.lines_path):
            # the mutation emptied the workspace (delete of every doc
            # removes the table root): an index over nothing is noise —
            # drop it rather than leave a crashing fingerprint behind
            hfs.delete(self.spark, self.ann_index_path)
            return
        meta = ivf_read_meta(self.spark, self.ann_index_path)
        new_lines = self._lines_of_docs(todo)
        assigned = ivf_assign(
            new_lines, n_centroids=meta["n_centroids"], dim=meta["dim"],
            seed=meta["seed"], vec_col="embedding", centroids=meta["centroids"],
        ) if new_lines is not None else None
        new_touched = (
            sorted(
                r["centroid_id"]
                for r in assigned.select("centroid_id").distinct().collect()
            )
            if assigned is not None
            else []
        )
        touched = sorted(set(old_centroids) | set(new_touched))
        if touched:
            idx = self.spark.read.parquet(self.ann_index_path).filter(
                F.col("centroid_id").isin(touched)
            )
            kept = idx.join(F.broadcast(todo.select("doc")), "doc", "left_anti")
            merged = (
                kept.unionByName(assigned.select(*kept.columns))
                if assigned is not None
                else kept
            )
            _swap_buckets(
                self.spark, self.ann_index_path, merged, touched,
                part_col="centroid_id",
            )
        hfs.write_text(
            self.spark,
            f"{self.ann_index_path}/_source_fingerprint.json",
            json.dumps({"lines_md5": self._lines_fingerprint()}),
        )

    # ---- W5/W6: filtered search ----------------------------------------
    def search(
        self,
        query: str,
        top_k: int = 3,
        max_distance: float | None = None,
        doc_subset: list | None = None,
        ignore_case: bool = False,
        use_index: bool = False,
        nprobe: int = 2,
    ) -> DataFrame:
        """Cosine search over stored line embeddings with optional doc
        filter (the reference pushes `path IN (...)` into qdrant,
        store.rs:508-515; ours is a partition-prunable isin filter).
        Exact per-partition top-k + global merge — no oversampling error.

        Workspace semantics differ from file-search S9: the threshold is
        a PUSHDOWN applied together with the top_k truncation
        (store.rs:498-499 score_threshold + :538-544 sort-and-truncate),
        not an either/or.

        ``use_index=True`` searches through the persistent IVF index
        (:meth:`build_ann_index`) when one exists AND is fresh: the scan
        partition-prunes to the ``nprobe`` nearest inverted lists
        (approximate — exact within the probed lists). A stale or absent
        index falls back to the exact scan; the path actually taken is
        recorded in ``last_search_index_type`` / ``stats()``."""
        from semtools_spark.embedding import HashEmbedder
        from semtools_spark.functions.vectors import cosine_distance_expr, vector_literal

        self.last_search_index_type = "exact-cosine"
        stored = self.lines()
        if stored is None:
            return self.spark.createDataFrame(
                [],
                f"doc {self._doc_key_type()}, line_no int, line string, "
                "distance double",
            )
        if use_index and self.ann_index_fresh():
            from semtools_spark.operators.similarity import (
                ivf_probe_ids,
                ivf_read_meta,
            )

            q0 = query.lower() if ignore_case else query
            qv = HashEmbedder(dim=self.dim, seed=self.seed).embed_one(q0)
            meta = ivf_read_meta(self.spark, self.ann_index_path)
            probe = ivf_probe_ids(
                qv, nprobe, meta["n_centroids"], meta["dim"], meta["seed"],
                centroids=meta["centroids"],
            )
            stored = (
                self.spark.read.parquet(self.ann_index_path)
                .filter(F.col("centroid_id").isin(probe))
                .select("doc", "line_no", "line", "embedding")
            )
            self.last_search_index_type = "ivf-indexed"
            if doc_subset is not None:
                stored = stored.filter(F.col("doc").isin(doc_subset))
        elif doc_subset is not None:
            if _bucket_ids(self.spark, self.lines_path):
                # bucketed layout: turn the doc filter into a PARTITION
                # filter too — the scan then reads only the subset's
                # bucket directories instead of the whole table (the
                # pushdown analog of the reference's qdrant path filter,
                # store.rs:508-515). One tiny local job computes the
                # subset's bucket ids.
                kdf = self.spark.createDataFrame(
                    [(d,) for d in doc_subset], f"doc {self._doc_key_type()}"
                )
                buckets = [
                    r[BUCKET_COL]
                    for r in kdf.select(
                        _bucket_expr("doc", self.n_buckets).alias(BUCKET_COL)
                    ).distinct().collect()
                ]
                snap = self._snapshot_table(self.lines_path, "lines")
                if snap is not None:
                    stored = snap.filter(
                        F.col(BUCKET_COL).isin(buckets)
                    ).drop(BUCKET_COL)
            stored = stored.filter(F.col("doc").isin(doc_subset))
        q = query.lower() if ignore_case else query
        qvec = HashEmbedder(dim=self.dim, seed=self.seed).embed_one(q)
        scored = stored.withColumn("__q", vector_literal(qvec)).select(
            "doc",
            "line_no",
            "line",
            cosine_distance_expr("embedding", "__q", dim=self.dim).alias("distance"),
        )
        if max_distance is not None:
            scored = scored.filter(F.col("distance") < float(max_distance))
        return scored.orderBy("distance", "doc", "line_no").limit(top_k)

    # ---- A4: the ask agent's search tool ---------------------------------
    #: reference ask/tools.rs:109-128 Config defaults — note they differ
    #: from the CLI's (n_lines 3, no max_distance)
    AGENT_SEARCH_DEFAULTS = {"n_lines": 5, "max_distance": 0.5, "top_k": 3,
                             "ignore_case": False}

    def agent_search(self, query: str, doc_subset: list | None = None, **overrides) -> DataFrame:
        """A4: the agent's search tool — workspace search under the agent
        defaults (ask/tools.rs:109-128), with the ±n_lines context windows
        the tool renders (format_ranked_lines, tools.rs:58-84) attached
        from the stored lines table instead of re-reading files. Returns
        (doc, start, end, match_line, distance, content)."""
        from semtools_spark.operators.search import attach_context

        p = {**self.AGENT_SEARCH_DEFAULTS, **overrides}
        lines = self.lines()
        if lines is None:
            # empty workspace: same contract as search() — an empty
            # result in the tool's schema, not a crash
            return self.spark.createDataFrame(
                [],
                f"doc {self._doc_key_type()}, start int, end int, "
                "match_line int, distance double, content string",
            )
        hits = self.search(
            query, top_k=p["top_k"], max_distance=p["max_distance"],
            doc_subset=doc_subset, ignore_case=p["ignore_case"],
        )
        stored = lines.select("doc", "line_no", "line")
        out = attach_context(
            hits.select("doc", "line_no", "distance"), stored, p["n_lines"]
        )
        return out.orderBy("distance", "doc", "match_line")

    # ---- W7/W8: delete & prune -----------------------------------------
    def _doc_key_type(self) -> str:
        """DDL type of the ``doc`` key, read from the stored manifest
        schema — a workspace keyed by url STRINGS (the web corpus's
        natural key) must not get its list-form delete keys coerced to
        long (r3 hardcoded ``doc long`` and crashed on string keys)."""
        man = self.manifest()
        if man is not None:
            return man.schema["doc"].dataType.simpleString()
        return "long"

    def delete(self, doc_ids: list | DataFrame, id_col: str = "doc") -> dict[str, int]:
        """W7 cascade delete: manifest row + all line embeddings.

        Accepts a small driver-side list (CLI parity — the reference takes
        ids on the command line, cmds/workspace.rs) OR a DataFrame of keys
        for distributed callers — never collect a big id set just to pass
        it here."""
        if isinstance(doc_ids, DataFrame):
            # caller-supplied keys may read the very tables the deletes
            # swap (a filtered manifest() is the natural way to build
            # them): the manifest delete renames the files the keys'
            # scan snapshot-listed, so the lines delete's lazy
            # re-evaluation would chase vanished files. Materialize the
            # key column first — O(keys), same as prune()'s stale set.
            keys = doc_ids.select(F.col(id_col).alias("doc")).localCheckpoint()
        else:
            keys = self.spark.createDataFrame(
                [(d,) for d in doc_ids], f"doc {self._doc_key_type()}"
            )
        with self._lease():
            self._ensure_table_retention()
            index_maintain = self.ann_index_fresh()
            old_centroids: list[int] = []
            if index_maintain:
                old_centroids = self._ann_delta_centroids(keys)
            n_docs = delete_keys(
                self.spark, self.manifest_path, keys, ("doc",),
                num_buckets=self.n_buckets,
            )
            self._heartbeat()
            n_lines = delete_keys(
                self.spark, self.lines_path, keys, ("doc",),
                num_buckets=self.n_buckets,
            )
            out = {"docs": n_docs, "lines": n_lines}
            if index_maintain:
                self._ann_index_apply_delta(keys, old_centroids)
            self._ensure_table_retention(publish=False)
            self._publish_wsnap()
            return out

    def prune(self, existing_docs: DataFrame, id_col: str = "doc_id") -> dict[str, int]:
        """W8: stored ∖ existing → cascade delete (anti-join prune).

        The stale set stays a DataFrame end-to-end (no driver collect).
        It is checkpointed before the deletes because the first delete
        atomically swaps the manifest directory the anti-join reads —
        without materialization the second delete would lazily re-evaluate
        against the already-pruned manifest and delete nothing."""
        man = self.manifest()
        if man is None:
            return {"docs": 0, "lines": 0}
        with self._lease():
            self._ensure_table_retention()
            stale = man.join(
                existing_docs.select(F.col(id_col).alias("doc")), "doc", "left_anti"
            ).select("doc").localCheckpoint()
            index_maintain = self.ann_index_fresh()
            old_centroids = self._ann_delta_centroids(stale) if index_maintain else []
            n_docs = delete_keys(
                self.spark, self.manifest_path, stale, ("doc",),
                num_buckets=self.n_buckets,
            )
            self._heartbeat()
            n_lines = delete_keys(
                self.spark, self.lines_path, stale, ("doc",),
                num_buckets=self.n_buckets,
            )
            out = {"docs": n_docs, "lines": n_lines}
            if index_maintain:
                self._ann_index_apply_delta(stale, old_centroids)
            self._ensure_table_retention(publish=False)
            self._publish_wsnap()
            return out

    # ---- W9: stats -------------------------------------------------------
    def stats(self) -> dict:
        man, lines = self.manifest(), self.lines()
        # vs reference HNSW index_type (store.rs:443): report the physical
        # search path available (a stale index is NOT advertised — search
        # would fall back to exact) and the one the last search took
        return {
            "total_documents": man.count() if man is not None else 0,
            "total_lines": lines.count() if lines is not None else 0,
            "dim": self.dim,
            "index_type": (
                "ivf-indexed" if self.ann_index_fresh() else "exact-cosine"
            ),
            "last_search_index_type": self.last_search_index_type,
        }

    # ---- O3 JSON surfaces (reference json_mode.rs:40-51) ----------------
    def status_json(self) -> str:
        """``WorkspaceOutput{name, root_dir, total_documents}`` — the
        `workspace use/status --json` payload (cmds/workspace.rs:69-113)."""
        import json

        return json.dumps(
            {
                "name": os.path.basename(self.root.rstrip("/")),
                "root_dir": self.root,
                "total_documents": self.stats()["total_documents"],
            }
        )

    def prune_json(self, existing_docs: DataFrame, id_col: str = "doc_id") -> str:
        """Prune + the ``PruneOutput{files_removed, files_remaining}``
        payload (json_mode.rs:48-51; cmds/workspace.rs:115-160)."""
        import json

        removed = self.prune(existing_docs, id_col=id_col)
        return json.dumps(
            {
                "files_removed": removed["docs"],
                "files_remaining": self.stats()["total_documents"],
            }
        )
