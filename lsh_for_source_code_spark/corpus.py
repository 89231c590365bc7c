"""Deterministic synthetic source-code corpus with recorded ground truth
(FIXTURES.md F1).

Clone families mirror the phenomena in the reference's corpus/results:
type-1 byte-identical copies (the 75 pairs of the reference's 100% CSV, all
sha-equal -- SURVEY.md 2.4), type-2 renames, type-3 edits straddling the
0.5/0.7 thresholds, containment dups, and boilerplate headers that drive
mega-band skew (reference: 300/4,632 files in one signature group).

Everything derives from a single seed; no wall-clock, no external data.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

_KEYWORDS = ["public", "static", "void", "int", "String", "return", "new", "if", "for", "class"]
_STMTS = [
    "int {v} = {n};",
    "String {v} = \"{v}_{n}\";",
    "{v} = {v} + {n};",
    "if ({v} > {n}) {{ {v} -= {n}; }}",
    "for (int i{n} = 0; i{n} < {n}; i{n}++) {{ {v} += i{n}; }}",
    "System.out.println({v});",
    "process_{v}({v}, {n});",
    "double {v}_d = {v} * {n}.5;",
    "list_{v}.add({n});",
    "return_{v} |= check_{v}({n});",
]
_BOILERPLATE = "\n".join(
    [
        "// Licensed under the Example License, Version 9.9 (the License);",
        "// you may not use this file except in compliance with the License.",
        "// You may obtain a copy of the License at http://example.invalid/LICENSE",
        "// Unless required by applicable law or agreed to in writing, software",
        "// distributed under the License is distributed on an AS IS BASIS,",
        "// WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.",
    ]
    * 5
)


@dataclass
class SyntheticCorpus:
    files: pd.DataFrame  # repo,path,commit,lang,content
    truth: pd.DataFrame  # file_seq,family,family_id


def _body(rng: np.random.Generator, n_stmts: int, ident: str) -> list[str]:
    lines = []
    for _ in range(n_stmts):
        t = _STMTS[rng.integers(0, len(_STMTS))]
        lines.append(t.format(v=f"{ident}{rng.integers(0, 5)}", n=rng.integers(0, 100)))
    return lines


def _rename(lines: list[str], old: str, new: str) -> list[str]:
    return [ln.replace(old, new) for ln in lines]


def generate_corpus(n_files: int = 500, seed: int = 1234) -> SyntheticCorpus:
    rng = np.random.default_rng(seed)
    rows, truth = [], []
    fam_id = 0
    i = 0
    while i < n_files:
        u = rng.random()
        if u < 0.50:  # unique
            lines = _body(rng, int(rng.integers(20, 60)), f"var{i}_")
            rows.append("\n".join(lines))
            truth.append(("unique", fam_id))
            i += 1
        elif u < 0.65:  # type-1: byte-exact copies
            k = int(rng.integers(2, 6))
            lines = _body(rng, int(rng.integers(20, 60)), f"t1v{fam_id}_")
            content = "\n".join(lines)
            for _ in range(min(k, n_files - i)):
                rows.append(content)
                truth.append(("type1", fam_id))
                i += 1
        elif u < 0.80:  # type-2: consistent identifier renames
            k = int(rng.integers(2, 5))
            lines = _body(rng, int(rng.integers(30, 70)), f"t2v{fam_id}_")
            for m in range(min(k, n_files - i)):
                variant = _rename(lines, f"t2v{fam_id}_", f"ren{fam_id}m{m}_") if m else lines
                rows.append("\n".join(variant))
                truth.append(("type2", fam_id))
                i += 1
        elif u < 0.90:  # type-3: statement insertions/deletions
            k = int(rng.integers(2, 4))
            lines = _body(rng, 50, f"t3v{fam_id}_")
            for m in range(min(k, n_files - i)):
                variant = list(lines)
                if m:
                    n_edit = int(rng.integers(5, 20))
                    for _ in range(n_edit):
                        if rng.random() < 0.5 and len(variant) > 10:
                            del variant[int(rng.integers(0, len(variant)))]
                        else:
                            variant.insert(
                                int(rng.integers(0, len(variant))),
                                _body(rng, 1, f"ins{fam_id}m{m}_")[0],
                            )
                rows.append("\n".join(variant))
                truth.append(("type3", fam_id))
                i += 1
        elif u < 0.95:  # containment: seed embedded in a much larger file
            seed_lines = _body(rng, 30, f"cv{fam_id}_")
            rows.append("\n".join(seed_lines))
            truth.append(("containment", fam_id))
            i += 1
            if i < n_files:
                big = (
                    _body(rng, 100, f"host{fam_id}_")
                    + seed_lines
                    + _body(rng, 100, f"tail{fam_id}_")
                )
                rows.append("\n".join(big))
                truth.append(("containment", fam_id))
                i += 1
        else:  # boilerplate: shared 30-line header + unique body (skew driver)
            # Body is sized so cross-family jaccard stays < 0.5: candidate
            # generation sees the mega-band skew (shared header shingles
            # collide in many bands) but verification rejects the pairs --
            # the real-world license-header pattern. Verified pairs stay
            # linear in corpus size; candidate pressure does not.
            k = int(rng.integers(3, 8))
            for _ in range(min(k, n_files - i)):
                tail = _body(rng, 35, f"bp{i}_")
                rows.append(_BOILERPLATE + "\n" + "\n".join(tail))
                truth.append(("boilerplate", fam_id))
                i += 1
        fam_id += 1

    n = len(rows)
    files = pd.DataFrame(
        {
            "repo": [f"org{j % 7}/repo{j % 97}" for j in range(n)],
            "path": [f"src/pkg{j % 13}/Class{j}.java" for j in range(n)],
            "commit": [f"{j:040x}" for j in range(n)],
            "lang": ["java"] * n,
            "content": rows,
        }
    )
    tdf = pd.DataFrame(truth, columns=["family", "family_id"])
    tdf["file_seq"] = np.arange(n)
    return SyntheticCorpus(files=files, truth=tdf)


def corpus_df(spark, n_files: int = 500, seed: int = 1234):
    """code_files DataFrame (input_hint shape) + truth pandas sidecar."""
    c = generate_corpus(n_files, seed)
    df = spark.createDataFrame(c.files)
    return df, c.truth
