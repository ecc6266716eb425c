"""Deterministic synthetic `repos` table + ontology vocabulary + golden triples.

Mirrors the reference's input universe re-targeted at source code
(BASELINE.json input_hint): an Iceberg-style table
``(repo, path, commit, lang, content)`` whose content embeds a known
lexicon of "ontology" terms, so the expected (subj, pred, obj) triples are
computable in closed form (FIXTURES.md §1/§4).

Reference analogs:
  - surface-form dictionary with attr tiers 1..6:
    /root/reference/TextProcessing/src/cs/uga/edu/dicgenerator/DictionaryGenerator.java:216-287
  - per-entity categories feeding the λ weight matrix:
    /root/reference/TextProcessing/src/cs/uga/edu/esum/EntityProc.java:440-453
  - skewed head entities (our `java.util.List` ≈ DBpedia `United_States`).

Everything is a pure function of (seed, n_files): numpy RandomState only,
no wall clock, no network.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

PREDICATES = ["imports", "defines", "calls", "mentions", "typeOf", "inClass"]

# stop-predicates / noise analogs of the reference's predicate stoplist
# (src/esum/EntityProc.java:260-277,329)
STOP_IMPORTS = {"__future__", "sys", "os"}

_LANGS = ["python", "java", "scala", "go"]

# base lexicon: (canonical_name, category_count, [extra multiword surface])
_BASE_ENTITIES = [
    ("java.util.List", 5, "linked list"),
    ("java.util.Map", 4, "hash map"),
    ("numpy.ndarray", 4, "n dimensional array"),
    ("pandas.DataFrame", 5, "data frame"),
    ("spark.sql.DataFrame", 5, None),
    ("collections.OrderedDict", 2, "ordered dict"),
    ("threading.Lock", 2, None),
    ("re.Pattern", 1, "regular expression"),
    ("json.JSONDecoder", 2, None),
    ("pathlib.Path", 3, None),
]


def _sha40(s: str) -> str:
    return hashlib.sha1(s.encode()).hexdigest()


@dataclass
class RepoFixture:
    repos: pd.DataFrame            # repo, path, commit, lang, content
    vocab: pd.DataFrame            # surface, entity_id, attr, entity_name
    entity_category: pd.DataFrame  # entity_id, category
    expected_triples: pd.DataFrame  # subj, pred, obj, repo, path, commit
    seed: int


def _make_vocab(rng: np.random.RandomState, n_entities: int):
    """Entity universe + surface forms (attr tiers 1..6, incl. ambiguity)."""
    names: list[str] = [e[0] for e in _BASE_ENTITIES]
    cat_counts: list[int] = [e[1] for e in _BASE_ENTITIES]
    multiword: list[str | None] = [e[2] for e in _BASE_ENTITIES]
    pkgs = ["com.acme", "org.widget", "io.grid", "net.core", "dev.tool"]
    kinds = ["Service", "Handler", "Parser", "Engine", "Cache", "Router",
             "Codec", "Planner", "Worker", "Store"]
    i = 0
    while len(names) < n_entities:
        nm = f"{pkgs[i % len(pkgs)]}.{kinds[i % len(kinds)]}{i:03d}"
        names.append(nm)
        cat_counts.append(int(rng.randint(0, 6)))
        multiword.append(None)
        i += 1

    vocab_rows = []
    cat_rows = []
    for eid, (nm, ncat, mw) in enumerate(zip(names, cat_counts, multiword)):
        short = nm.rsplit(".", 1)[-1].lower()
        vocab_rows.append((nm.lower(), eid, 1, nm))      # title
        vocab_rows.append((short, eid, 4, nm))           # name-short
        if mw:
            vocab_rows.append((mw.lower(), eid, 2, nm))  # redirect
        for c in range(ncat):
            cat_rows.append((eid, f"cat_{(eid * 7 + c) % 40:02d}"))
    # ambiguity: give a handful of short surfaces a second entity
    # (exercises link scoring, FIXTURES.md §2)
    ambiguous = [r for r in vocab_rows if r[2] == 4][: max(3, n_entities // 50)]
    for surf, eid, _, _ in ambiguous:
        other = (eid + 17) % n_entities
        vocab_rows.append((surf, other, 5, names[other]))  # disambiguation tier

    vocab = pd.DataFrame(vocab_rows, columns=["surface", "entity_id", "attr", "entity_name"])
    vocab["attr"] = vocab["attr"].astype("int32")
    vocab["entity_id"] = vocab["entity_id"].astype("int64")
    cats = pd.DataFrame(cat_rows, columns=["entity_id", "category"])
    cats["entity_id"] = cats["entity_id"].astype("int64")
    return names, vocab, cats


def make_fixture(
    n_files: int = 200,
    seed: int = 42,
    n_entities: int = 120,
    noise_lines: int = 0,
) -> RepoFixture:
    """``noise_lines`` appends that many deterministic no-triple code lines
    per file (assignments, dotless calls, non-lexicon comments). Real
    source files are KBs where most lines yield no facts — the default
    tiny files overstate shuffle relative to parse compute; benches pass
    ~135 for ~4.5 KB files. Golden triples are unaffected."""
    rng = np.random.RandomState(seed)
    names, vocab, cats = _make_vocab(rng, n_entities)
    head = names[0]  # skew head entity — appears in ~30% of files

    func_pool = [f"fn_{w}{i:02d}" for i, w in enumerate(
        ["load", "parse", "merge", "rank", "emit", "score", "walk", "fold"] * 8)]

    repo_names = [f"org/proj{chr(97 + i)}" for i in range(8)]
    rows, expected = [], []
    for fi in range(n_files):
        repo = repo_names[int(rng.randint(len(repo_names)))]
        path = f"src/mod_{fi:05d}.py"
        lang = _LANGS[int(rng.randint(len(_LANGS)))]
        commit = _sha40(f"{seed}:{repo}:{path}")
        subj = f"{repo}/{path}"

        lines = [f"# module {subj}"]
        # imports (incl. skew head ~30%, plus stoplisted noise)
        n_imp = int(rng.randint(2, 6))
        imp_ids = rng.choice(len(names), size=n_imp, replace=False)
        imps = [names[j] for j in imp_ids]
        if rng.rand() < 0.30 and head not in imps:
            imps.append(head)
        if rng.rand() < 0.5:
            lines.append(f"import {list(STOP_IMPORTS)[int(rng.randint(3))]}")  # filtered
        for im in imps:
            lines.append(f"import {im}")
            expected.append((subj, "imports", im, repo, path, commit))

        # mention comment lines (multi-word surfaces exercise the AC matcher)
        n_men = int(rng.randint(1, 4))
        men_ids = rng.choice(len(names), size=n_men, replace=False)
        men_surfs = []
        for j in men_ids:
            surfs = vocab[(vocab.entity_id == j) & (vocab.attr <= 2)]
            s = surfs.surface.iloc[int(rng.randint(len(surfs)))]
            men_surfs.append((s, names[j]))
        lines.append("# see also: " + ", ".join(s for s, _ in men_surfs))
        for _, nm in men_surfs:
            expected.append((subj, "mentions", nm, repo, path, commit))

        # defs + calls
        n_def = int(rng.randint(1, 4))
        defs = [func_pool[int(j)] for j in rng.choice(len(func_pool), n_def, replace=False)]
        for d in defs:
            lines.append(f"def {d}(x):")
            expected.append((subj, "defines", d, repo, path, commit))
            callee = imps[int(rng.randint(len(imps)))]
            lines.append(f"    return {callee}.of(x)")
            expected.append((subj, "calls", callee, repo, path, commit))
        # noise that must NOT produce triples
        lines.append("x = 42")
        lines.append(f"# checksum {rng.randint(10**6)}")
        for nz in range(noise_lines):
            k = (fi * 31 + nz) % 4
            if k == 0:
                lines.append(f"    acc_{nz} = acc_{nz} + offset * {nz} - 7")
            elif k == 1:
                lines.append(f"    result = combine(left_{nz}, right_{nz}, mode)")
            elif k == 2:
                lines.append(f"# step {nz}: accumulate partial totals into the buffer")
            else:
                lines.append(f"    if state_{nz} > threshold: state_{nz} -= delta")

        rows.append((repo, path, commit, lang, "\n".join(lines) + "\n"))

    repos = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    exp = pd.DataFrame(
        expected, columns=["subj", "pred", "obj", "repo", "path", "commit"]
    ).drop_duplicates(ignore_index=True)
    return RepoFixture(repos=repos, vocab=vocab, entity_category=cats,
                       expected_triples=exp, seed=seed)
