"""S6: remote paged-listing source as a Spark 4 Python DataSource.

The reference's Google Drive walk
(utils/20251223-csv-from-googledrive.py:45-107: stack-based recursive
folder walk, pageToken pagination with pageSize 1000, mimeType filter,
dedup by file id, media download) becomes a first-class ``spark.read``
format.  The network API is modeled by a LOCAL directory tree — the
semantics (recursive walk, page-chunked listing, type filter, id
dedup) are identical, and swapping the local walk for an HTTP client
changes only ``_list_files``.

Why a DataSource and not a driver loop: the listing happens once on
the driver (cheap — metadata only), but each PAGE becomes a Spark
partition, so the expensive part — downloading and parsing file
CONTENT — runs on executors in parallel.  That is the scale posture
the reference's sequential download loop lacks.

Usage::

    spark.dataSource.register(PagedStoreDataSource)
    df = (spark.read.format("paged_store")
          .option("path", "/data/store_root")
          .option("suffix", ".txt")          # the mimeType filter
          .option("page_size", "100")
          .load())
    # -> (file_id, name, folder, size, content)
"""

from __future__ import annotations

import hashlib
from pathlib import Path

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STORE_SCHEMA = StructType(
    [
        StructField("file_id", StringType()),
        StructField("name", StringType()),
        StructField("folder", StringType()),
        StructField("size", LongType()),
        StructField("content", BinaryType()),
    ]
)


def file_identity(path: Path) -> str:
    """Stable id for a store entry (the Drive file-id analogue)."""
    return hashlib.md5(str(path).encode()).hexdigest()[:16]


def _list_files(root: str, suffix: str) -> list[tuple[str, str, str]]:
    """Recursive stack-based walk with id dedup, mirroring the
    reference's traversal (utils/20251223-csv-from-googledrive.py:45-107).
    Returns (file_id, name, folder) tuples in deterministic order."""
    seen: set[str] = set()
    out: list[tuple[str, str, str]] = []
    stack = [Path(root)]
    while stack:
        folder = stack.pop()
        for entry in sorted(folder.iterdir()):
            if entry.is_dir():
                stack.append(entry)
            elif not suffix or entry.name.endswith(suffix):
                fid = file_identity(entry)
                if fid in seen:  # id dedup, as the reference does
                    continue
                seen.add(fid)
                out.append((fid, str(entry), str(folder)))
    return out


class PagedStorePartition(InputPartition):
    def __init__(self, files: list[tuple[str, str, str]]):
        self.files = files


class PagedStoreReader(DataSourceReader):
    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("paged_store requires option 'path'")
        self.suffix = options.get("suffix", "")
        self.page_size = int(options.get("page_size", "1000"))

    def partitions(self):
        # Driver-side listing is metadata-only; each PAGE of the listing
        # becomes one Spark partition (the pageToken loop, distributed).
        files = _list_files(self.root, self.suffix)
        pages = [
            files[i : i + self.page_size] for i in range(0, len(files), self.page_size)
        ] or [[]]
        return [PagedStorePartition(p) for p in pages]

    def read(self, partition):
        # Executor-side: the media download (here: local read).
        for fid, path, folder in partition.files:
            p = Path(path)
            content = p.read_bytes()
            yield (fid, p.name, folder, len(content), content)


class PagedStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_store"

    def schema(self):
        return STORE_SCHEMA

    def reader(self, schema):
        return PagedStoreReader(self.options)
