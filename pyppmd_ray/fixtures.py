"""Deterministic synthetic source-code tables (FIXTURES.md F1/F2).

Generates the north-rule input shape from BASELINE.json's ``input_hint``:
``(repo:string, path:string, commit:string, lang:string,
content:large_string)`` — seeded, reproducible, no external data.

Content stresses every codec + the selector (FIXTURES.md F1):
- token-templated pseudo-code per lang (byte-level redundancy → LZ/FSST);
- heavy-tailed lognormal lengths incl. empty strings;
- ~5% exact duplicate contents (dedup path);
- ~1% high-entropy base64-ish blobs (incompressible guard);
- a sprinkle of non-ASCII UTF-8 (mirrors the reference's unicode tests,
  `/root/reference/tests/test_fuzzer.py:15-37`, `tests/test_ppmd8.py:96-107`).
"""

from __future__ import annotations

import os
import string

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["python", "c", "cpp", "java", "js", "go", "rust", "md", "json", "yaml", "sh", "txt"]
_EXT = {
    "python": "py", "c": "c", "cpp": "cc", "java": "java", "js": "js", "go": "go",
    "rust": "rs", "md": "md", "json": "json", "yaml": "yaml", "sh": "sh", "txt": "txt",
}

_TEMPLATES = {
    "python": [
        "def {f}({a}, {b}):\n    return {a} + {b}\n",
        "class {C}:\n    def __init__(self, {a}):\n        self.{a} = {a}\n",
        "    if {a} is None:\n        raise ValueError('{w} must not be None')\n",
        "import {m}\nfrom {m} import {f}\n",
        "    for {a} in range(len({b})):\n        {b}[{a}] += 1\n",
        "# {w} {w2}: handles the {w} case\n",
        "    result = [{f}(x) for x in {b} if x > 0]\n",
    ],
    "c": [
        "static int {f}(int {a}, int {b}) {{\n    return {a} + {b};\n}}\n",
        "if ({a} == NULL) {{\n    return -1;\n}}\n",
        "for (size_t i = 0; i < {a}_len; i++) {{\n    {b}[i] = 0;\n}}\n",
        "#include <{m}.h>\n",
        "/* {w} {w2} buffer */\nchar {a}[{n}];\n",
        "memcpy({a}, {b}, sizeof({a}));\n",
    ],
    "md": [
        "## {W} {W2}\n\nThe {w} module provides {w2} support.\n",
        "- `{f}()` — returns the {w} of `{a}`\n",
        "```\n{f}({a})\n```\n",
        "See the [{w} guide](docs/{w}.md) for details.\n",
    ],
    "json": [
        '  "{w}": "{w2}",\n',
        '  "{w}": {n},\n',
        '  "{w}": ["{w2}", "{w}"],\n',
        '  "{w}_enabled": true,\n',
    ],
}
for _l in LANGS:
    _TEMPLATES.setdefault(_l, _TEMPLATES["c"] if _l in ("cpp", "java", "js", "go", "rust") else _TEMPLATES["md"])

_VOCAB = (
    "data block codec table stream buffer index shard chunk record field value "
    "offset length hash batch column row group part merge split scan read write "
    "encode decode pack unpack init flush reset state config param meta util "
    "worker actor task node cluster plan stage sink source filter map reduce "
    "cache pool queue lock atomic async sync local remote"
).split()


def _line_pool(lang: str, rng: np.random.Generator, size: int = 400) -> list[str]:
    tpls = _TEMPLATES[lang]
    pool = []
    for _ in range(size):
        t = tpls[int(rng.integers(len(tpls)))]
        w = {
            "f": "do_" + _VOCAB[int(rng.integers(len(_VOCAB)))],
            "a": _VOCAB[int(rng.integers(len(_VOCAB)))],
            "b": _VOCAB[int(rng.integers(len(_VOCAB)))],
            "m": _VOCAB[int(rng.integers(len(_VOCAB)))],
            "w": _VOCAB[int(rng.integers(len(_VOCAB)))],
            "w2": _VOCAB[int(rng.integers(len(_VOCAB)))],
            "n": int(rng.integers(1, 4096)),
        }
        w["C"] = w["f"].title().replace("_", "")
        w["W"] = w["w"].title()
        w["W2"] = w["w2"].title()
        pool.append(t.format(**w))
    return pool


_B64 = np.frombuffer((string.ascii_letters + string.digits + "+/").encode(), dtype=np.uint8)


def generate_source_table(n_rows: int, seed: int = 42) -> pa.Table:
    """The F1 ``source_files`` table at a given row count."""
    rng = np.random.default_rng(seed)

    # zipf-weighted categorical draws
    lang_w = 1.0 / np.arange(1, len(LANGS) + 1) ** 1.3
    lang_idx = rng.choice(len(LANGS), size=n_rows, p=lang_w / lang_w.sum())
    n_repos = 50
    repo_w = 1.0 / np.arange(1, n_repos + 1) ** 1.2
    repo_idx = rng.choice(n_repos, size=n_rows, p=repo_w / repo_w.sum())
    repos = [f"org{i % 7}/repo{i}" for i in range(n_repos)]

    # ≤8 distinct commits per repo (FIXTURES.md)
    import hashlib

    commit_pool = [
        [hashlib.sha1(f"{r}:{k}".encode()).hexdigest() for k in range(8)] for r in range(n_repos)
    ]
    commit_k = rng.integers(0, 8, size=n_rows)

    dirs = ["src", "lib", "core", "tests", "docs", "internal", "pkg", "engine", "io", "utils"]
    pools = {l: _line_pool(l, np.random.default_rng(seed + 1000 + i)) for i, l in enumerate(LANGS)}

    # heavy-tailed length in lines: lognormal body, clamped
    n_lines = np.clip(rng.lognormal(3.4, 1.1, size=n_rows), 0, 12000).astype(np.int64)
    n_lines[rng.random(n_rows) < 0.01] = 0  # empty files

    kind = rng.random(n_rows)  # <0.01 → high-entropy blob; <0.03 → unicode-rich

    contents: list[str] = [""] * n_rows
    paths: list[str] = [""] * n_rows
    commits: list[str] = [""] * n_rows
    repo_col: list[str] = [""] * n_rows

    for i in range(n_rows):
        lang = LANGS[lang_idx[i]]
        pool = pools[lang]
        d1 = dirs[int(rng.integers(len(dirs)))]
        d2 = dirs[int(rng.integers(len(dirs)))]
        stem = _VOCAB[int(rng.integers(len(_VOCAB)))]
        paths[i] = f"{d1}/{d2}/{stem}_{int(rng.integers(1000))}.{_EXT[lang]}"
        commits[i] = commit_pool[repo_idx[i]][commit_k[i]]
        repo_col[i] = repos[repo_idx[i]]
        if kind[i] < 0.01:
            m = int(rng.integers(200, 8000))
            contents[i] = _B64[rng.integers(0, 64, size=m)].tobytes().decode()
        else:
            k = int(n_lines[i])
            if k == 0:
                contents[i] = ""
                continue
            idx = rng.integers(0, len(pool), size=k)
            body = "".join(pool[j] for j in idx)
            if kind[i] < 0.03:
                body = "# ünïcode ✓ 标注 🎈\n" + body
            contents[i] = body

    # ~5% exact duplicates: copy content from an earlier row
    n_dup = n_rows // 20
    if n_dup and n_rows > 10:
        dst = rng.integers(1, n_rows, size=n_dup)
        src = (dst * 7919) % dst  # deterministic earlier row
        for d, s in zip(dst, src):
            contents[int(d)] = contents[int(s)]

    return pa.table(
        {
            "repo": pa.array(repo_col, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": pa.array([LANGS[j] for j in lang_idx], type=pa.string()),
            "content": pa.array(contents, type=pa.large_string()),
        }
    )


def source_table_path(n_rows: int, seed: int = 42, cache_dir: str = "/tmp/pyppmd_ray_fixtures") -> str:
    """Parquet DIRECTORY for the F1 table, generated once and cached.

    Sharded into many files: one parquet file is ONE Ray read task (the
    whole read serializes); a 100 TB input is naturally many files, so the
    fixture mirrors that layout."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"source_files_n{n_rows}_s{seed}_sharded")
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        tbl = generate_source_table(n_rows, seed)
        shard_rows = 2048
        n_shards = max(1, -(-n_rows // shard_rows))
        for s in range(n_shards):
            sub = tbl.slice(s * shard_rows, shard_rows)
            pq.write_table(
                sub, os.path.join(tmp, f"part-{s:05d}.parquet"), row_group_size=1024
            )
        os.replace(tmp, path)
    return path


def generate_csv_like(n_rows: int = 10_000, seed: int = 42) -> bytes:
    """F2: tabular-text corpus analogous to the reference's
    10000SalesRecords.csv (`/root/reference/tests/test_ppmd7.py:73`)."""
    rng = np.random.default_rng(seed)
    regions = ["Asia", "Europe", "Sub-Saharan Africa", "Middle East and North Africa",
               "Australia and Oceania", "Central America and the Caribbean", "North America"]
    items = ["Baby Food", "Cereal", "Clothes", "Cosmetics", "Fruits", "Household",
             "Meat", "Office Supplies", "Personal Care", "Snacks", "Vegetables"]
    lines = ["Region,Country,Item Type,Sales Channel,Order Priority,Order Date,Order ID,"
             "Ship Date,Units Sold,Unit Price,Unit Cost,Total Revenue,Total Cost,Total Profit"]
    for _ in range(n_rows):
        r = regions[int(rng.integers(len(regions)))]
        it = items[int(rng.integers(len(items)))]
        ch = "Online" if rng.random() < 0.5 else "Offline"
        pr = "HMLC"[int(rng.integers(4))]
        d1 = f"{int(rng.integers(1,13))}/{int(rng.integers(1,29))}/{int(rng.integers(2010,2018))}"
        d2 = f"{int(rng.integers(1,13))}/{int(rng.integers(1,29))}/{int(rng.integers(2010,2018))}"
        oid = int(rng.integers(100000000, 999999999))
        units = int(rng.integers(1, 10000))
        price = round(float(rng.uniform(1, 700)), 2)
        cost = round(price * 0.7, 2)
        lines.append(
            f"{r},Country{int(rng.integers(200))},{it},{ch},{pr},{d1},{oid},{d2},"
            f"{units},{price:.2f},{cost:.2f},{units*price:.2f},{units*cost:.2f},"
            f"{units*(price-cost):.2f}"
        )
    return ("\n".join(lines) + "\n").encode()
