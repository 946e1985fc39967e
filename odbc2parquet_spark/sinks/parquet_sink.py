"""Parquet sink with the reference's output-shaping semantics.

Reference behaviors reproduced (cites into /root/reference):

- compression default zstd, configurable codec+level
  (src/enum_args.rs:34-70, src/main.rs:159-168).
- batch/row-group sizing: rows-per-batch = min(row cap, memory cap /
  bytes-per-row), defaults 65535 rows / 2 GiB (src/query/batch_size_limit.rs).
  Spark analogue: ``maxRecordsPerFile`` + parquet block size; the
  bytes-per-row estimate reuses the same schema-derived arithmetic.
- file splitting with numeric suffixes ``out_01.par, out_02.par, ...``,
  configurable suffix width, roll on N row groups and/or byte threshold
  (src/query/batch_size_limit.rs:18-55, src/query/parquet_writer.rs:149-189,
  path_with_suffix :232-250). Distributed writes can't name files mid-flight,
  so the exact naming is a deterministic driver-side rename pass after the
  parallel write — planning unaffected.
- ``--no-empty-file``: suppress output entirely for empty results; default
  writes a schema-only file (src/query/parquet_writer.rs:117-121,155-158).
- crash-safety: Spark's FileOutputCommitter writes to ``_temporary`` and
  commits on success — the built-in equivalent of the reference's
  tempfile-until-finalized CurrentFile (src/query/current_file.rs:14-80).
- column statistics stay on (parquet-mr default), matching
  tests/integration.rs:3990.

Scale note: "directory mode" (default) is the 100 TB path — one file per
task, no driver involvement. "file mode" (``single_file`` / split suffixes)
exists for CLI parity on export-sized results only.
"""

from __future__ import annotations

import glob
import math
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame

from odbc2parquet_spark.mappings import estimate_bytes_per_row

DEFAULT_BATCH_SIZE_ROWS = 65_535  # batch_size_limit.rs:6-15
DEFAULT_BATCH_MEMORY_BYTES = 2 * 1024**3  # 2 GiB


@dataclass
class SinkOptions:
    compression: str = "zstd"  # reference default (enum_args.rs:56-59)
    batch_size_rows: int | None = None  # rows per row-group/file unit
    batch_memory_bytes: int | None = None  # memory cap -> rows via bytes/row
    row_groups_per_file: int = 0  # 0 = no row-group-count splitting
    file_size_threshold: int = 0  # bytes; 0 = no size splitting
    suffix_length: int = 2  # width of _NN suffix (parquet_writer.rs:232-250)
    no_empty_file: bool = False
    single_file: bool = False  # CLI-parity: exactly one .par file


def rows_per_batch(opts: SinkOptions, bytes_per_row: int) -> int:
    """min(row cap, memory cap / bytes-per-row) — batch_size_limit.rs:59-109."""
    row_cap = opts.batch_size_rows or DEFAULT_BATCH_SIZE_ROWS
    mem = opts.batch_memory_bytes or DEFAULT_BATCH_MEMORY_BYTES
    mem_cap = max(1, mem // max(bytes_per_row, 1))
    return max(1, min(row_cap, mem_cap))


def path_with_suffix(path: str, index: int, suffix_length: int) -> str:
    """``out.par`` + 3 -> ``out_03.par`` (parquet_writer.rs:232-250)."""
    stem, ext = os.path.splitext(path)
    return f"{stem}_{index:0{suffix_length}d}{ext}"


def write_parquet(df: DataFrame, path: str, opts: SinkOptions | None = None) -> list[str]:
    """Write ``df`` to parquet with the reference's shaping semantics.

    Returns the list of files/directories produced. Directory mode (no
    splitting flags, ``single_file=False``) writes a standard parquet
    directory — the scale path. File mode materializes ``path`` (or
    ``path_with_suffix`` parts) as single .par files via a driver-side
    rename of the committed part files.
    """
    opts = opts or SinkOptions()
    file_mode = opts.single_file or opts.row_groups_per_file or opts.file_size_threshold

    if opts.no_empty_file and df.isEmpty():
        return []

    bpr = estimate_bytes_per_row(df.schema)
    batch_rows = rows_per_batch(opts, bpr)

    writer = df.write.mode("overwrite").option("compression", opts.compression)

    if not file_mode:
        writer.option("maxRecordsPerFile", batch_rows).parquet(path)
        return [path]

    # -- file mode: parallel write to a staging dir, deterministic rename --
    if opts.row_groups_per_file:
        records_per_file = batch_rows * opts.row_groups_per_file
    elif opts.file_size_threshold:
        # size threshold -> approximate rows via the schema bytes/row estimate,
        # mirroring how the reference converts its memory cap to rows.
        records_per_file = max(1, opts.file_size_threshold // bpr)
    else:
        records_per_file = 0  # single file

    staging = path + ".__staging__"
    w = df.write.mode("overwrite").option("compression", opts.compression)
    if records_per_file:
        w = w.option("maxRecordsPerFile", records_per_file)
    else:
        df = df.coalesce(1)
        w = df.write.mode("overwrite").option("compression", opts.compression)
    w.parquet(staging)

    parts = sorted(glob.glob(os.path.join(staging, "part-*")))
    produced: list[str] = []
    try:
        if len(parts) <= 1 and not (opts.row_groups_per_file or opts.file_size_threshold):
            target = path
            if parts:
                shutil.move(parts[0], target)
            produced.append(target)
        else:
            width = max(opts.suffix_length, int(math.log10(max(len(parts), 1))) + 1)
            for i, part in enumerate(parts, start=1):
                target = path_with_suffix(path, i, width)
                shutil.move(part, target)
                produced.append(target)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return produced
