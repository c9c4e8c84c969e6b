"""``tokenkv`` — the reference's token ``k|v`` format as a registered
Spark Python DataSource (``spark.read.format("tokenkv")``).

This is the DataSource-V2 counterpart of the reference's pluggable
``IOFormat`` registry (reflection-selected user format,
``servant/IOFormatServant.java:32-128``, ``MapTaskServant.java:49-60``)
and reproduces its split semantics precisely, minus the one
anti-pattern:

- S1 splitter (``IOFormatServant.java:130-164``): fixed-size byte
  chunks **extended to the next whitespace boundary** so no token
  straddles splits. Here: each read task skips a leading partial token
  when it does not start at a boundary and reads past its end offset
  to finish its last token (TextInputFormat-style) — the same
  semantics WITHOUT materializing split files (the reference writes
  each chunk to disk as ``<input><i>.txt``; our splits are logical
  byte ranges).
- S2 reader (``TokenRecordReader.java:139-189``): whitespace
  tokenization, ``k|v`` parse on the FIRST ``|``, un-piped tokens get
  key ``"none"``.
- R4 writer (``TokenRecordWriter.java:85``): ``key|value`` records,
  one per line (split-friendly; byte-stream variant in
  :mod:`inf2106_map_reduce_spark.mrlite.tokenformat`).

Scale: default split size is 128 MB (the reference's 2048-byte default
would create 50 million tasks per 100 TB file); pass
``option("split_size", ...)`` to override — tests use tiny splits to
exercise the boundary logic.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

NONE_KEY = "none"
DEFAULT_SPLIT_SIZE = 128 * 1024 * 1024
_WS = b" \t\r\n"


class _Split(InputPartition):
    def __init__(self, path: str, start: int, end: int, file_size: int) -> None:
        self.path = path
        self.start = start
        self.end = end
        self.file_size = file_size


class TokenKVReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tokenkv requires a path")
        self.split_size = int(options.get("split_size", DEFAULT_SPLIT_SIZE))

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if not f.startswith(("_", "."))
            )
        return [self.path]

    def partitions(self) -> list[_Split]:
        out = []
        for f in self._files():
            size = os.path.getsize(f)
            if size == 0:
                continue
            start = 0
            while start < size:
                end = min(start + self.split_size, size)
                out.append(_Split(f, start, end, size))
                start = end
        return out or [_Split(self._files()[0], 0, 0, 0)] if self._files() else []

    def read(self, partition: _Split):
        if partition.file_size == 0:
            return
        with open(partition.path, "rb") as fh:
            pos = partition.start
            if partition.start > 0:
                # Ownership rule: a token belongs to the split holding
                # its FIRST byte. If the byte before `start` is part of
                # a token, we landed mid-token (or right after its last
                # byte) — that token is the previous split's; skip to
                # the next whitespace. If it IS whitespace, a token
                # starting exactly at `start` is OURS — no skip (the
                # reference instead EXTENDS the prior chunk to the
                # boundary; same ownership, different mechanism).
                fh.seek(partition.start - 1)
                prev = fh.read(1)
                if prev not in _WS:
                    while pos < partition.file_size:
                        ch = fh.read(1)
                        pos += 1
                        if not ch or ch in _WS:
                            break
            else:
                fh.seek(0)
            buf = bytearray()
            while True:
                # a token that STARTS before `end` belongs to this
                # split, even if it finishes past it
                if pos >= partition.end and not buf:
                    break
                ch = fh.read(1)
                if not ch:
                    if buf:
                        yield self._parse(buf)
                    break
                pos += 1
                if ch in _WS:
                    if buf:
                        yield self._parse(buf)
                        buf = bytearray()
                else:
                    buf += ch

    @staticmethod
    def _parse(buf: bytearray) -> tuple[str, str]:
        tok = buf.decode("utf-8")
        if "|" in tok:
            k, _, v = tok.partition("|")
            return (k, v)
        return (NONE_KEY, tok)


class _Commit(WriterCommitMessage):
    pass


class TokenKVWriter(DataSourceWriter):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tokenkv requires a path")

    def write(self, iterator) -> _Commit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.txt")
        with open(out, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(f"{row[0]}|{row[1]}\n")
        return _Commit()


class TokenKVDataSource(DataSource):
    """``spark.dataSource.register(TokenKVDataSource)`` then
    ``spark.read.format("tokenkv").load(path)`` /
    ``df.write.format("tokenkv").save(path)``."""

    @classmethod
    def name(cls) -> str:
        return "tokenkv"

    def schema(self) -> str:
        return "key string, value string"

    def reader(self, schema) -> TokenKVReader:
        return TokenKVReader(self.options)

    def writer(self, schema, overwrite: bool) -> TokenKVWriter:
        return TokenKVWriter(self.options)


def register(spark) -> None:
    """Idempotent registration of the tokenkv format."""
    try:
        spark.dataSource.register(TokenKVDataSource)
    except Exception:
        pass  # already registered in this session
