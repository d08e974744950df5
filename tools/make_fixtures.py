#!/usr/bin/env python
"""Generate the golden KG fixtures: a PURE-PYTHON single-node run of the
whole web-KG pipeline (parse → triples → link → canonicalize → graph),
sharing only leaf-level pure functions (make_page, extract_text,
HashEmbedder) with the Spark engine — none of the DataFrame code paths.

The committed fixture is the 'reference extractor' of BASELINE.json: the
Spark pipeline's output must match it at P/R ≥ 0.95 (tests assert 1.0).

Usage: python tools/make_fixtures.py [n_pages] [seed]
Writes tests/fixtures/webkg_graph_n{n}_s{seed}.jsonl (sorted, stable).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from semtools_spark.embedding import HashEmbedder
from semtools_spark.operators.kg import ENTITIES, RELATIONS
from semtools_spark.operators.parse import PASSTHROUGH_EXTS, extract_text
from semtools_spark.sources.web_pages import make_page


def reference_graph(n_pages: int, seed: int, dim: int = 64) -> list[dict]:
    relations, entities = set(RELATIONS), set(ENTITIES)

    # parse + triple extraction, single-node loop
    triples: list[tuple[str, str, str]] = []
    for i in range(n_pages):
        page = make_page(i, seed)
        ext = page["url"].rsplit(".", 1)[-1].lower()
        if ext in PASSTHROUGH_EXTS:
            text = page["html"].decode("utf-8")
        else:
            text = extract_text(page["html"])
        assert text == page["text"], f"extractor drift at {page['url']}"
        if not text:
            continue
        w = re.split(r"\s+", text)
        for j in range(len(w) - 2):
            if w[j + 1] in relations and w[j] in entities and w[j + 2] in entities:
                triples.append((w[j], w[j + 1], w[j + 2]))

    # link: cosine top-1 of each distinct mention vs the entity catalog
    emb = HashEmbedder(dim=dim, seed=seed)
    cat = emb.embed_texts(list(ENTITIES))
    norms = np.linalg.norm(cat, axis=1)
    norms[norms == 0] = 1.0
    catn = cat / norms[:, None]
    mentions = sorted({t[0] for t in triples} | {t[2] for t in triples})
    link: dict[str, int] = {}
    for m in mentions:
        sims = emb.embed_one(m) @ catn.T
        link[m] = int(sims.argmax())

    # canonicalize: union-find over the bipartite mention→entity graph;
    # canonical id = min entity id in the component
    parent: dict[object, object] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for m, e in link.items():
        union(("m", m), ("e", e))
    comp_min: dict[object, int] = {}
    for m, e in link.items():
        r = find(("m", m))
        comp_min[r] = min(comp_min.get(r, e), e)
    canonical = {m: comp_min[find(("m", m))] for m in link}

    # graph: canonical triples with provenance counts
    counts: dict[tuple, int] = {}
    for s, p, o in triples:
        key = (s, p, o, canonical[s], canonical[o])
        counts[key] = counts.get(key, 0) + 1
    return [
        {"subj": s, "pred": p, "obj": o, "subj_id": si, "obj_id": oi, "n_mentions": n}
        for (s, p, o, si, oi), n in sorted(counts.items())
    ]


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    rows = reference_graph(n_pages, seed)
    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.abspath(os.path.join(out_dir, f"webkg_graph_n{n_pages}_s{seed}.jsonl"))
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r, sort_keys=True) + "\n")
    print(f"wrote {len(rows)} canonical triples → {out}")


if __name__ == "__main__":
    main()
