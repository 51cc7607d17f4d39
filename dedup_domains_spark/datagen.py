"""Deterministic synthetic-data generators (FIXTURES.md).

Two fixture families:
  * ``code_files`` — the production input shape from BASELINE.json input_hint:
    (repo, path, commit, lang, content), with planted duplicate classes
    (exact / near / simhash_near / contained / boilerplate / passthrough /
    unique) and a side oracle table of expected clusters.
  * ``dnsbl_lines`` — reference-parity pfBlockerNG CSV rows
    (reference tests/001_inputs/e_adaway.fat shape, columns decoded at
    reference src/pfb_prune.c:132-164).

All generation is a pure function of (seed, row index): prefix-stable, so
sf_test is a strict prefix of sf_bench.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

_LANGS = ["python", "java", "c", "js", "go", "md"]

_TOKEN_POOL = [
    "def", "return", "if", "else", "for", "while", "import", "class",
    "self", "data", "value", "result", "index", "count", "buffer", "node",
    "parse", "read", "write", "open", "close", "hash", "key", "map",
    "list", "append", "len", "range", "print", "assert", "raise", "try",
    "except", "with", "yield", "lambda", "None", "True", "False", "not",
    "and", "or", "in", "is", "int", "str", "float", "dict", "set", "tuple",
]

_LICENSE_TEMPLATE = (
    "Licensed under the Apache License Version 2.0 the License "
    "you may not use this file except in compliance with the License "
    "You may obtain a copy of the License at http apache org licenses "
    "LICENSE 2.0 Unless required by applicable law or agreed to in writing "
    "software distributed under the License is distributed on an AS IS BASIS "
    "WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND either express or implied "
    "See the License for the specific language governing permissions and "
    "limitations under the License"
)

BLOCK = 20  # rows per planted-structure block


def _row_rng(seed: int, i: int, salt: str = "") -> np.random.Generator:
    h = hashlib.sha256(f"{seed}:{i}:{salt}".encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "big"))


def _gen_tokens(rng: np.random.Generator, n: int) -> list[str]:
    idx = rng.integers(0, len(_TOKEN_POOL), size=n)
    # sprinkle unique-ish identifiers so distinct docs don't collide
    toks = [_TOKEN_POOL[j] for j in idx]
    for p in range(0, n, 17):
        toks[p] = f"ident_{rng.integers(0, 10**9)}"
    return toks


def _edit_tokens(tokens: list[str], rng: np.random.Generator, frac: float) -> list[str]:
    out = list(tokens)
    n_edit = max(1, int(len(out) * frac))
    pos = rng.choice(len(out), size=min(n_edit, len(out)), replace=False)
    for p in pos:
        out[p] = f"edit_{rng.integers(0, 10**9)}"
    return out


@dataclass
class CodeCorpus:
    """Main table + oracle side tables as pandas frames."""

    files: pd.DataFrame       # repo, path, commit, lang, content
    expected: pd.DataFrame    # repo, path, commit, kind, expected_cluster_id
    pairs: pd.DataFrame       # id_a, id_b, kind  (ids are the integer row uid)


def gen_code_corpus(n_rows: int, seed: int = 42, avg_tokens: int = 160) -> CodeCorpus:
    """Deterministic code corpus with planted duplicate classes.

    Rows come in blocks of 20 (uid = block*20 + j):
      j 0-9   unique base docs
      j 10/11 exact dup of j=0 / j=1          (reference rule D1)
      j 12/13 near dup (~2% token edits) of j=2 / j=3   (MinHash/LSH class)
      j 14    simhash-near (single localized edit) of j=4
      j 15    wrapper containing j=5's content verbatim (j=5 is subsumed —
              reference rule D2, domaintree.c:330-339 analog)
      j 16    boilerplate license (identical across ALL blocks — mega-bucket)
      j 17    boilerplate with one-token edit (near of the license)
      j 18    passthrough (lang='binary'; analog of strength-2 carry-over)
      j 19    near dup of j=6
    """
    rows, expected, pairs = [], [], []
    zipf_repos = 997  # fixed pool so generation is prefix-stable in n_rows

    for i in range(n_rows):
        b, j = divmod(i, BLOCK)
        rng = _row_rng(seed, i)
        # Zipf-ish repo assignment drives per-repo skew
        repo_id = int(_row_rng(seed, i, "repo").zipf(1.5)) % zipf_repos
        lang = _LANGS[i % len(_LANGS)]
        ext = {"python": "py", "java": "java", "c": "c", "js": "js",
               "go": "go", "md": "md"}[lang]
        repo = f"org{repo_id % 7}/repo{repo_id}"
        path = f"src/pkg{b % 13}/mod_{i}.{ext}"
        commit = hashlib.sha1(f"{seed}:{i}:commit".encode()).hexdigest()

        base_uid = b * BLOCK
        kind, cluster, content = "unique", i, None
        ntok = int(avg_tokens * (0.5 + _row_rng(seed, i, "len").random() * 1.5))

        if j <= 9:
            content = " ".join(_gen_tokens(rng, ntok))
            kind, cluster = "unique", i
        elif j in (10, 11):
            src = base_uid + (j - 10)
            content = " ".join(_gen_tokens(_row_rng(seed, src), int(
                avg_tokens * (0.5 + _row_rng(seed, src, "len").random() * 1.5))))
            kind, cluster = "exact", src
            pairs.append((src, i, "exact"))
        elif j in (12, 13):
            src = base_uid + (j - 10)
            src_toks = _gen_tokens(_row_rng(seed, src), int(
                avg_tokens * (0.5 + _row_rng(seed, src, "len").random() * 1.5)))
            content = " ".join(_edit_tokens(src_toks, rng, 0.02))
            kind, cluster = "near", src
            pairs.append((src, i, "near"))
        elif j == 14:
            src = base_uid + 4
            src_toks = _gen_tokens(_row_rng(seed, src), int(
                avg_tokens * (0.5 + _row_rng(seed, src, "len").random() * 1.5)))
            src_toks[len(src_toks) // 2] = "simhash_localized_edit"
            content = " ".join(src_toks)
            kind, cluster = "simhash_near", src
            pairs.append((src, i, "simhash_near"))
        elif j == 15:
            src = base_uid + 5
            inner = " ".join(_gen_tokens(_row_rng(seed, src), int(
                avg_tokens * (0.5 + _row_rng(seed, src, "len").random() * 1.5))))
            wrapper = " ".join(_gen_tokens(rng, ntok))
            content = f"{wrapper} {inner} {wrapper[::-1]}"
            kind, cluster = "contained", src     # j=5 subsumed by this row
            pairs.append((src, i, "contained"))
        elif j == 16:
            content = _LICENSE_TEMPLATE
            kind, cluster = "boilerplate", -1    # single global cluster
        elif j == 17:
            toks = _LICENSE_TEMPLATE.split()
            toks[5 + (b % 5)] = f"edit_{b}"
            content = " ".join(toks)
            kind, cluster = "boilerplate", -1
        elif j == 18:
            lang, ext = "binary", "bin"
            path = f"assets/blob_{i}.bin"
            content = hashlib.sha256(f"{seed}:{i}:blob".encode()).hexdigest() * 4
            kind, cluster = "passthrough", i
        else:  # j == 19
            src = base_uid + 6
            src_toks = _gen_tokens(_row_rng(seed, src), int(
                avg_tokens * (0.5 + _row_rng(seed, src, "len").random() * 1.5)))
            content = " ".join(_edit_tokens(src_toks, rng, 0.03))
            kind, cluster = "near", src
            pairs.append((src, i, "near"))

        rows.append((repo, path, commit, lang, content))
        expected.append((repo, path, commit, i, kind, cluster))

    files = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    exp = pd.DataFrame(
        expected,
        columns=["repo", "path", "commit", "uid", "kind", "expected_cluster_id"],
    )
    prs = pd.DataFrame(pairs, columns=["id_a", "id_b", "kind"])
    prs = prs[(prs.id_a < n_rows) & (prs.id_b < n_rows)]
    return CodeCorpus(files=files, expected=exp, pairs=prs)


# ---------------------------------------------------------------------------
# dnsbl_lines — reference-parity domain rows
# ---------------------------------------------------------------------------

def make_dnsbl_row(domain: str, strength: int, listname: str = "list_a",
                   groupname: str = "DNSBL_Compilation") -> str:
    """Verbatim pfBlockerNG CSV line (reference tests/001_inputs shape)."""
    return f",{domain},,0,{listname},{groupname},{strength}"


def gen_dnsbl_lines(n_files: int = 3, rows_per_file: int = 2000,
                    seed: int = 42) -> pd.DataFrame:
    """Random domain rows with ~30% planted redundancy (matching the in-repo
    corpus prune rate, BASELINE.md) + the 12 structural cases from
    FIXTURES.md §1 planted at the head of file 0.

    Columns: source_file, file_order, linenumber, domain, listname,
    groupname, match_strength, raw_line.
    """
    rng = np.random.default_rng(seed)
    tlds = ["com", "net", "org", "io", "ru"]
    out = []

    structural = [
        # (domain, strength) — FIXTURES.md §1 case list
        ("dup.example.com", 0), ("dup.example.com", 0),            # 1 exact dup
        ("x-full.com", 1), ("a.b.x-full.com", 0),                  # 2 parent first
        ("c.d.y-full.com", 0), ("y-full.com", 1),                  # 3 retroactive wipe
        ("weakpar.com", 0), ("child.weakpar.com", 0),              # 4 both kept
        ("w1.chain.com", 0), ("w2.w1.chain.com", 0), ("chain.com", 0),  # 5 chain
        ("upgrade.com", 0), ("upgrade.com", 1),                    # 6 weak→strong
        ("downgr.com", 1), ("downgr.com", 0),                      # 7 strong→weak
        (r"^ad[0-9]+\.", 2),                                       # 9 regex row
    ]
    for fi in range(n_files):
        ln = 0
        if fi == 0:
            for dom, st in structural:
                ln += 1
                out.append(("file_0", 0, ln, dom, "list_a",
                            "DNSBL_Compilation", st, make_dnsbl_row(dom, st)))
        base = rows_per_file
        for k in range(base):
            ln += 1
            r = np.random.default_rng(
                int.from_bytes(hashlib.sha256(f"{seed}:{fi}:{k}".encode()).digest()[:8], "big"))
            tld = tlds[int(r.integers(0, len(tlds)))]
            # ~15% rows are a FULL parent; ~25% are children of some parent id
            pid = int(r.integers(0, rows_per_file))
            roll = r.random()
            if roll < 0.15:
                dom, st = f"site{pid}.{tld}", 1
            elif roll < 0.40:
                dom, st = f"sub{int(r.integers(0, 50))}.site{pid}.{tld}", 0
            elif roll < 0.43:
                dom, st = f"site{pid}.{tld}", 0
            else:
                dom, st = f"host{fi}-{k}.uniq{pid}.{tld}", 0
            out.append((f"file_{fi}", fi, ln, dom, f"list_{fi}",
                        "DNSBL_Compilation", st, make_dnsbl_row(dom, st, f"list_{fi}")))

    return pd.DataFrame(out, columns=[
        "source_file", "file_order", "linenumber", "domain", "listname",
        "groupname", "match_strength", "raw_line"])
