"""Spark 4 Python DataSource for the reference's native ``.mwaspkl``
condensed-metadata format (S5, SURVEY.md §2.1) — `spark.read.format(
"mwaspkl").load(dir)` scans a directory of per-BioProject pickle files
in parallel, one input partition per file.

Format (reference spec — main/converter_.py:52-58,
main/metadata_set_maker.py:94-102, main/mwaspkl_to_readable_csv.py):
each file holds two sequential pickles — ``biosamples_ref`` (list of
biosample accessions) and ``set_df`` (pandas DataFrame with columns
``attributes``, ``values``, ``biosample_index_list``, ``include?``).
The index list is a SPACE OPTIMIZATION: when a set covers most
biosamples the reference stores the excluded indices with
``include?=False``. This reader performs the same decode the
reference's readable-csv exporter does (complement against the ref
list — our SO2), yielding explicit member accessions. One-byte files
(b'0' empty / b'1' blacklisted) produce no rows, matching the
reference's skip semantics.

Why a DataSource and not a driver loop: the reference converts files
one-at-a-time per process; here each file is an ``InputPartition``, so
a million-BioProject corpus scans with full cluster parallelism and the
result is a first-class DataFrame (filters/joins/writes compose).
Schema is fixed and tiny (strings + one array), so there is no schema
inference cost.

Trust model: ``pickle.load`` executes arbitrary bytecode by design.
This reader exists for the reference pipeline's OWN artifacts (the
same trust the reference's every stage assumes); never point it at an
untrusted directory. The parquet ingest paths remain the default for
new data.
"""

from __future__ import annotations

import os
import pickle

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = (
    "bioproject string, attributes string, set_values string, "
    "biosample_ids array<string>, n_set int, n_total int"
)


class MwaspklDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mwaspkl"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "MwaspklReader":
        return MwaspklReader(self.options)


class MwaspklReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("mwaspkl: .load(path) is required (file or directory)")
        self._path = path

    def partitions(self):
        if os.path.isdir(self._path):
            files = sorted(
                p
                for f in os.listdir(self._path)
                if f.endswith(".mwaspkl")
                # skip junk entries: a stray subdirectory or dangling
                # symlink named *.mwaspkl would otherwise crash the
                # whole scan inside a task (r12 review finding)
                and os.path.isfile(p := os.path.join(self._path, f))
            )
        else:
            files = [self._path]
        # one partition per file: the file is the reference's unit of
        # work AND of skew (a big BioProject is one big pickle) — finer
        # splitting is impossible (pickle is not splittable), coarser
        # would serialize unrelated files
        return [InputPartition(f) for f in files]

    def read(self, partition):
        if partition is None:
            # pyspark's data-source worker substitutes [None] when
            # partitions() returns [] (empty directory) — yield nothing
            return
        path = partition.value
        if os.path.getsize(path) <= 1:
            return  # b'0' empty / b'1' blacklisted sentinel: no rows
        base = os.path.basename(path)
        # the directory branch guarantees the extension; a single-file
        # load does not — blind [:-8] silently corrupted the bioproject
        # name for any other extension (r12 review finding)
        bioproject = (
            base[: -len(".mwaspkl")]
            if base.endswith(".mwaspkl")
            else os.path.splitext(base)[0]
        )
        with open(path, "rb") as f:
            biosamples_ref = pickle.load(f)
            set_df = pickle.load(f)
        n_total = len(biosamples_ref)
        # column-zip, not iterrows: no per-row Series construction on
        # the per-file decode hot path (r12 review finding)
        for attrs, vals, idx_list, include in zip(
            set_df["attributes"],
            set_df["values"],
            set_df["biosample_index_list"],
            set_df["include?"],
        ):
            if include:
                # preserve stored order and duplicates — the reference
                # decode derefs the index list as-is
                # (mwaspkl_to_readable_csv.py:20-29; r12 review finding:
                # sorted(set(...)) deviated on non-sorted-unique lists)
                members = [biosamples_ref[i] for i in idx_list]
            else:
                idx = set(idx_list)
                members = [
                    s for i, s in enumerate(biosamples_ref) if i not in idx
                ]
            yield (
                bioproject,
                str(attrs),
                str(vals),
                members,
                len(members),
                n_total,
            )


def register(spark) -> None:
    """Idempotent registration: after this, ``spark.read.format(
    "mwaspkl")`` resolves in this session."""
    spark.dataSource.register(MwaspklDataSource)
