"""Deterministic synthetic (repo, path, commit, lang, content) generator.

The engine's only external input shape (BASELINE.json.input_hint):
    repo:string, path:string, commit:string, lang:string, content:string

Design (FIXTURES.md §1): seeded, reproducible, no external data.
  * ~30% of paths are drawn from a pool shared across repos -> shared-path
    edges between files of different repos;
  * ~20% of files reuse a pooled content blob -> shared-sha edges;
  * ~1% duplicate (repo,path) rows with a different commit, and ~1% empty
    content rows, injected to exercise filters/dedup.

The generator is pure numpy / O(rows) and is used both by unit tests
(tiny/small) and by bench.py (bench tier, >=1e6 rows) — at bench sizes it
is invoked *inside* Ray tasks (one task per repo-range shard) so synthesis
itself is distributed and never materializes on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_EXT_LANG = [
    ("py", "py"), ("c", "c"), ("cc", "cpp"), ("rs", "rs"), ("go", "go"), ("js", "js"),
]

_TEMPLATES = [
    "def f{k}(x):\n    return x * {k} + {j}\n",
    "int f{k}(int x) {{ return x * {k} + {j}; }}\n",
    "fn f{k}(x: i64) -> i64 {{ x * {k} + {j} }}\n",
    "func F{k}(x int) int {{ return x*{k} + {j} }}\n",
    "export const f{k} = (x) => x * {k} + {j};\n",
]


def _content(pool_id: int) -> str:
    """Deterministic content blob for a content-pool id."""
    t = _TEMPLATES[pool_id % len(_TEMPLATES)]
    body = t.format(k=pool_id % 97, j=pool_id % 31)
    # pad with a deterministic comment so contents are not trivially tiny
    pad = hashlib.sha256(str(pool_id).encode()).hexdigest()
    return body + "# " + pad + "\n" + body * (1 + pool_id % 3)


def synth_repo_files(
    n_repos: int,
    files_per_repo: int,
    seed: int = 42,
    repo_lo: int = 0,
    repo_hi: int | None = None,
) -> pa.Table:
    """Generate rows for repos in [repo_lo, repo_hi) of an n_repos corpus.

    Sharding by repo range keeps generation distributable: the full table
    for a given (n_repos, files_per_repo, seed) is the concatenation of any
    disjoint cover of [0, n_repos) and is byte-identical regardless of the
    sharding (each repo's rows depend only on (seed, repo index)).
    """
    if repo_hi is None:
        repo_hi = n_repos
    n_paths_pool = max(8, (n_repos * files_per_repo) // 8)      # shared path pool
    n_content_pool = max(8, (n_repos * files_per_repo) // 6)    # shared content pool

    repos, paths, commits, langs, contents = [], [], [], [], []
    for r in range(repo_lo, repo_hi):
        rng = np.random.default_rng(seed * 1_000_003 + r)
        repo = f"repo-{r:05d}"
        shared_mask = rng.random(files_per_repo) < 0.30
        shared_path_ids = rng.integers(0, n_paths_pool, files_per_repo)
        shared_content = rng.random(files_per_repo) < 0.20
        content_ids = rng.integers(0, n_content_pool, files_per_repo)
        empty_mask = rng.random(files_per_repo) < 0.01
        dup_mask = rng.random(files_per_repo) < 0.01
        seen = set()
        for f in range(files_per_repo):
            if shared_mask[f]:
                pid = int(shared_path_ids[f])
                ext, lang = _EXT_LANG[pid % len(_EXT_LANG)]
                path = f"src/shared/mod{pid % 50}/file{pid}.{ext}"
            else:
                ext, lang = _EXT_LANG[f % len(_EXT_LANG)]
                path = f"src/{repo}/pkg{f % 20}/file{f}.{ext}"
            if path in seen and not dup_mask[f]:
                # keep (repo,path) unique except for deliberate dup injection
                path = f"src/{repo}/uniq/file{f}.{ext}"
            seen.add(path)
            if shared_content[f]:
                content = _content(int(content_ids[f]))
            else:
                content = _content(n_content_pool + r * files_per_repo + f)
            if empty_mask[f]:
                content = ""
            commit = hashlib.sha256(f"{repo}:{f}:{seed}".encode()).hexdigest()[:40]
            repos.append(repo)
            paths.append(path)
            commits.append(commit)
            langs.append(lang)
            contents.append(content)

    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def synth_repo_files_dataset(
    n_repos: int,
    files_per_repo: int,
    seed: int = 42,
    repos_per_block: int = 64,
):
    """Distributed synthesis: one Ray task per repo-range shard.

    Returns a ray.data.Dataset with the input_hint schema. Lazy — blocks
    are generated inside tasks, never on the driver.
    """
    import ray.data as rd

    shards = [
        (lo, min(lo + repos_per_block, n_repos))
        for lo in range(0, n_repos, repos_per_block)
    ]
    shard_ds = rd.from_items(
        [{"lo": lo, "hi": hi} for lo, hi in shards]
    ).repartition(len(shards))

    def gen(batch: pa.Table) -> pa.Table:
        tables = [
            synth_repo_files(n_repos, files_per_repo, seed,
                             repo_lo=int(lo), repo_hi=int(hi))
            for lo, hi in zip(batch["lo"].to_pylist(), batch["hi"].to_pylist())
        ]
        return pa.concat_tables(tables)

    return shard_ds.map_batches(gen, batch_format="pyarrow", batch_size=1)


def expected_sha256(table: pa.Table) -> list[str]:
    """Row invariant helper for tests: sha256 of each content value."""
    return [hashlib.sha256(c.encode()).hexdigest() for c in table["content"].to_pylist()]


# Hand-built micro graphs for algorithm oracles (FIXTURES.md §3) -------------

def micro_graph(name: str) -> np.ndarray:
    """Return a (m, 2) int64 edge array for a named fixture micro-graph."""
    if name == "path_8":
        e = [(i, i + 1) for i in range(7)]
    elif name == "cycle_5":
        e = [(i, (i + 1) % 5) for i in range(5)]
    elif name == "star_1_50":
        e = [(0, i) for i in range(1, 51)]
    elif name == "two_cliques_k5":
        e = [(i, j) for i in range(5) for j in range(5) if i < j]
        e += [(5 + i, 5 + j) for i in range(5) for j in range(5) if i < j]
        e += [(4, 5)]  # bridge
    elif name == "two_cliques_k5_nobridge":
        e = [(i, j) for i in range(5) for j in range(5) if i < j]
        e += [(5 + i, 5 + j) for i in range(5) for j in range(5) if i < j]
    elif name == "multi_edge":
        e = [(0, 1), (0, 1), (1, 2), (2, 2), (3, 1), (0, 1)]
    elif name == "er_1k":
        rng = np.random.default_rng(42)
        a = rng.integers(0, 1000, (12000, 2))
        e = a[a[:, 0] != a[:, 1]]
        return e.astype(np.int64)
    elif name == "powerlaw_1k":
        # Barabási–Albert-style preferential attachment, m=3, seeded
        rng = np.random.default_rng(42)
        m = 3
        targets = list(range(m))
        repeated: list[int] = list(range(m))
        edges = []
        for v in range(m, 1000):
            chosen = set()
            while len(chosen) < m:
                chosen.add(int(repeated[rng.integers(0, len(repeated))]))
            for t in chosen:
                edges.append((v, t))
                repeated.extend([v, t])
        return np.array(edges, dtype=np.int64)
    else:
        raise KeyError(name)
    return np.array(e, dtype=np.int64)
