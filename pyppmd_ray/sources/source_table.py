"""Sources: build the north-rule table shape from raw inputs.

The reference consumes raw byte streams from files the caller opens
(`/root/reference/tests/test_ppmd7.py:61-69`). The engine's ingestion
source lifts a directory tree of source files into the
``(repo, path, commit, lang, content)`` Parquet shape so every pipeline
(encode, dedup, text analysis) runs over it.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

EXT_TO_LANG = {
    ".py": "python", ".c": "c", ".h": "c", ".cc": "cpp", ".cpp": "cpp",
    ".hpp": "cpp", ".java": "java", ".js": "js", ".ts": "js", ".go": "go",
    ".rs": "rust", ".md": "md", ".rst": "md", ".json": "json", ".yaml": "yaml",
    ".yml": "yaml", ".sh": "sh", ".txt": "txt", ".toml": "yaml", ".cfg": "txt",
}


def infer_lang(path: str) -> str:
    return EXT_TO_LANG.get(os.path.splitext(path)[1].lower(), "txt")


def read_source_files(
    root: str,
    *,
    repo: str | None = None,
    commit: str = "",
    file_extensions: list[str] | None = None,
) -> rd.Dataset:
    """Directory tree of source files → Dataset in the north-rule shape.

    Uses ``read_binary_files(include_paths=True)`` (file-level read
    parallelism). Content is decoded as strict UTF-8 when possible
    (``encoding='utf-8'``); non-UTF-8 files fall back to latin-1, which maps
    every byte to a valid codepoint (Arrow-string-safe, unlike
    surrogateescape) and is recorded in the ``encoding`` column so
    :func:`content_bytes` reproduces the exact original file bytes.
    """
    ds = rd.read_binary_files(
        root,
        include_paths=True,
        file_extensions=file_extensions,
    )
    repo_name = repo if repo is not None else os.path.basename(os.path.abspath(root))
    prefix = os.path.abspath(root)

    def to_rows(batch: pa.Table) -> pa.Table:
        paths = []
        langs = []
        contents = []
        encodings = []
        for p, b in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            ap = os.path.abspath(p)
            rel = ap[len(prefix) :].lstrip("/") if ap.startswith(prefix) else p
            paths.append(rel)
            langs.append(infer_lang(rel))
            raw = b or b""
            try:
                contents.append(raw.decode("utf-8"))
                encodings.append("utf-8")
            except UnicodeDecodeError:
                contents.append(raw.decode("latin-1"))
                encodings.append("latin-1")
        n = len(paths)
        return pa.table(
            {
                "repo": pa.array([repo_name] * n),
                "path": pa.array(paths),
                "commit": pa.array([commit] * n),
                "lang": pa.array(langs),
                "content": pa.array(contents, type=pa.large_string()),
                "encoding": pa.array(encodings),
            }
        )

    return ds.map_batches(to_rows, batch_format="pyarrow")


def content_bytes(text: str, encoding: str = "utf-8") -> bytes:
    """Inverse of the ingestion decode — exact original file bytes."""
    return text.encode(encoding)
