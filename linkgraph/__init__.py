"""linkgraph — a Ray-Data-native link-graph analytics engine.

A from-scratch reimplementation of the *capabilities* of GeminiGraph
(OSDI'16; reference at /root/reference) on Ray Data: Parquet repo-file
tables in, chunk-partitioned CSR/CSC Arrow blocks held in actor pools,
Gemini's dual-mode (sparse push / dense pull) signal-slot supersteps
re-expressed as vectorized numpy kernels over Arrow blocks with
object-store message shuffles.

Modules (SURVEY.md §7.1):
    io          parquet sources/sinks + schemas
    hashing     sha256 extraction, hash64
    ids         distributed dense vertex-id assignment
    synth       deterministic (repo,path,commit,lang,content) generator
    edges       edge derivation (shared path / content sha), dedup, degrees
    partition   degree-aware contiguous range partitioner (Gemini alpha rule)
    csr         pure Arrow/numpy CSR+CSC builders + row gather kernels
    store       graph store build: edges -> partitioned parquet -> meta
    shards      GraphShard actor (pinned CSR/CSC + vertex state)
    engine      process_vertices / process_edges superstep driver
    checkpoint  per-superstep parquet + manifest, resume
    algos       pagerank, cc, labelprop, triangles, bfs, sssp
    dedup       exact / minhash-lsh / simhash / ngram-jaccard / embedding near-dup
    text        language-id, quality scoring, token counts, fingerprints
    ann         brute-force + LSH-bucketed cosine top-k
    multimodal  binary-column decode/feature stages (stubbed decode)
"""

__version__ = "0.1.0"
