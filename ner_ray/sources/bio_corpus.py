"""S1/S2/S5 — BIO corpus file source & sink (the reference's native format).

Reference format (``data.py read_corpus`` / ``BERT_NER.py
NerProcessor._read_data`` (R), SURVEY.md §2 S1/S2): UTF-8 text, one
``char<SEP>tag`` per line (separator TAB or single space), **blank line =
sentence boundary**; the prediction writer (S5, ``model.py evaluate`` →
conlleval input) emits ``char gold pred`` lines in the same shape.

Distribution unit = FILE, not byte range: sentences cross line-split
boundaries, so splitting a file mid-stream would corrupt sentences.  Real
corpora in this family ship as many small shard files; each Ray task parses
whole files (``read_binary_files`` keeps one file per row).  Output schema:
``schemas.BIO_CORPUS`` (+ ``pred_tags`` for the S5 round-trip).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from ner_ray import schemas


def parse_bio_text(text: str, start_id: int = 0) -> pa.Table:
    """Parse one corpus file's text into BIO_CORPUS rows (pure function).

    Malformed lines (no separator) raise — the reference crashes on them too
    (implicit-positional schema, SURVEY.md §1.2).
    """
    sent_ids, chars_col, tags_col = [], [], []
    chars: list[str] = []
    tags: list[str] = []
    sid = start_id
    for line in text.split("\n"):
        line = line.rstrip("\r")
        if not line.strip():
            if chars:
                sent_ids.append(sid)
                chars_col.append(chars)
                tags_col.append(tags)
                sid += 1
                chars, tags = [], []
            continue
        if "\t" in line:
            ch, tag = line.split("\t", 1)
        else:
            ch, tag = line.rsplit(" ", 1)
        chars.append(ch)
        tags.append(tag)
    if chars:
        sent_ids.append(sid)
        chars_col.append(chars)
        tags_col.append(tags)
    return pa.table(
        {
            "sentence_id": pa.array(sent_ids, pa.int64()),
            "chars": pa.array(chars_col, pa.list_(pa.string())),
            "tags": pa.array(tags_col, pa.list_(pa.string())),
        },
        schema=schemas.BIO_CORPUS,
    )


def read_bio_corpus(paths: str | list[str]) -> Dataset:
    """Distributed BIO corpus read: one task per file; sentence ids are made
    globally unique by packing a 39-bit path hash into the high bits of a
    positive int64 (low 24 bits = per-file sentence counter).  39 bits keeps
    the 50% birthday-collision bound at ~740k corpus files (the old 32-bit
    hash collided at ~65k); a file exceeding 2^24 sentences raises instead of
    silently overflowing into the next file's id range."""
    import hashlib

    files = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            h = (
                int.from_bytes(
                    hashlib.blake2b(str(path).encode(), digest_size=8).digest(), "big"
                )
                >> 25  # keep 39 bits so (h << 24) stays within positive int64
            )
            t = parse_bio_text(data.decode("utf-8"), start_id=h << 24)
            if t.num_rows > 1 << 24:
                raise ValueError(
                    f"{path}: {t.num_rows} sentences overflows the 24-bit "
                    "per-file id range; shard the file"
                )
            tables.append(t)
        return pa.concat_tables(tables) if tables else parse_bio_text("")

    return files.map_batches(parse, batch_format="pyarrow")


def format_bio_text(table: pa.Table, pred_col: str | None = None, sep: str = "\t") -> str:
    """Inverse of ``parse_bio_text``; with ``pred_col`` emits the S5
    three-column ``char gold pred`` conlleval input."""
    lines: list[str] = []
    preds = table[pred_col].to_pylist() if pred_col else [None] * table.num_rows
    for chars, tags, pred in zip(
        table["chars"].to_pylist(), table["tags"].to_pylist(), preds
    ):
        for i, (c, t) in enumerate(zip(chars, tags)):
            lines.append(f"{c}{sep}{t}" if pred is None else f"{c}{sep}{t}{sep}{pred[i]}")
        lines.append("")
    return "\n".join(lines) + "\n"


def write_bio_corpus(
    ds: Dataset, out_dir: str, pred_col: str | None = None, sep: str = "\t"
) -> list[str]:
    """Sink: one text shard per block (S5 prediction-writer shape)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, batch in enumerate(ds.iter_batches(batch_format="pyarrow")):
        p = os.path.join(out_dir, f"part-{i:05d}.txt")
        with open(p, "w", encoding="utf-8") as f:
            f.write(format_bio_text(batch, pred_col=pred_col, sep=sep))
        paths.append(p)
    return paths
