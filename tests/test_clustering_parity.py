"""Quantified clustering/structural parity (VERDICT r1 item 6).

Round 1 asserted "structural parity" between our JAX kmeans++/KNN and the
reference's sklearn pipeline without measuring it.  These tests put numbers
on it, on shared fixtures:

- ARI between our kmeans labels and sklearn's (same data, same k),
- edge-set Jaccard between a reference-built ``hypergraph/edge_index`` and
  ours on the SAME h5 file, in two regimes:
  (a) a tie-free fixture where geometry forces the structure — both pipelines
      must produce essentially the same hypergraph (Jaccard ~ 1);
  (b) a realistic loose fixture where the partition is genuinely
      seed-sensitive — there the honest yardstick is OUR OWN seed-to-seed
      Jaccard (sklearn's MT19937 vs JAX PRNG is equivalent to a seed change;
      SURVEY §7), and ref-vs-ours must not be materially less similar than
      ours-vs-ours across seeds.

Measured values are printed so the numbers recorded in PARITY.md can be
refreshed.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
if not REF.exists():  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)
if str(REF) not in sys.path:
    sys.path.insert(0, str(REF))

import jax  # noqa: E402


def _blobs(rng, n=400, d=32, k=12, spread=0.08):
    centers = rng.standard_normal((k, d)) * 3.0
    assign = np.repeat(np.arange(k), n // k)
    pts = centers[assign] + spread * rng.standard_normal((len(assign), d))
    return pts.astype(np.float32), assign


def test_kmeans_ari_vs_sklearn():
    from sklearn.cluster import KMeans as SkKMeans
    from sklearn.metrics import adjusted_rand_score

    import jax.numpy as jnp

    from multimodal_fusion_tpu.ops.kmeans import kmeans

    rng = np.random.default_rng(3)
    x, _truth = _blobs(rng)
    ours = np.asarray(kmeans(jax.random.key(0), jnp.asarray(x), k=12, n_init=10).labels)
    sk = SkKMeans(n_clusters=12, random_state=42, n_init=10).fit(x).labels_
    ari = adjusted_rand_score(ours, sk)
    print(f"\nkmeans ARI vs sklearn (12 well-separated blobs): {ari:.4f}")
    assert ari > 0.9  # floor recorded in PARITY.md

    # and both recover the ground truth
    assert adjusted_rand_score(ours, _truth) > 0.95
    assert adjusted_rand_score(sk, _truth) > 0.95


def test_grouping_ari_vs_sklearn():
    """The similarity-row grouping stage: kmeans over [rows, T] similarity
    rows with genuine 4-group structure."""
    from sklearn.cluster import KMeans as SkKMeans
    from sklearn.metrics import adjusted_rand_score

    from multimodal_fusion_tpu.hypergraph.build import group_by_similarity

    rng = np.random.default_rng(5)
    # 4 row archetypes over 8 TMA columns, 40 rows
    arch = rng.uniform(0, 1, (4, 8))
    truth = np.repeat(np.arange(4), 10)
    sim = (arch[truth] + 0.03 * rng.standard_normal((40, 8))).astype(np.float32)
    ours, _ = group_by_similarity(sim, 4, method="kmeans", seed=42)
    sk = SkKMeans(n_clusters=4, random_state=42, n_init=10).fit(sim).labels_
    ari = adjusted_rand_score(ours, sk)
    print(f"\ngrouping ARI vs sklearn (4 row archetypes): {ari:.4f}")
    assert ari > 0.9  # floor recorded in PARITY.md


def _undirected_edge_set(edge_index):
    e = np.sort(np.asarray(edge_index).T, axis=1)
    e = e[e[:, 0] != e[:, 1]]  # drop self loops on both sides
    return {tuple(row) for row in np.unique(e, axis=0)}


def _write_h5(p, feats, pos, tma):
    import h5py

    with h5py.File(p, "w") as f:
        f["wsi/features"] = feats
        f["wsi/positions"] = pos
        f["tma/features"] = tma


def _ref_build(p, *args):
    import contextlib
    import io

    from build_hypergraph.preprocess_hypergraph import (
        process_single_file as ref_process,
    )

    with contextlib.redirect_stdout(io.StringIO()):
        try:
            ref_process(str(p), *args)
        except TypeError:
            # reference's stats-JSON step rejects np.int64 under modern
            # numpy; the h5 writes have already happened by then
            pass


def _edges_of(p):
    import h5py

    with h5py.File(p) as f:
        return _undirected_edge_set(f["hypergraph/edge_index"])


def _jaccard(a, b):
    return len(a & b) / len(a | b)


def test_edge_set_jaccard_forced_structure(tmp_path):
    """Tie-free geometry: 10 tight blobs, one super-patch each, 2 TMA cores
    co-located with every blob, KNN k=2 (the co-blob partners), 10
    hyperedges (the blobs).  Both pipelines are forced to the same
    hypergraph; Jaccard must be ~1."""
    from multimodal_fusion_tpu.hypergraph.build import process_single_file

    rng = np.random.default_rng(6)
    B, D = 10, 32
    centers = rng.standard_normal((B, D)) * 4.0
    assign = np.repeat(np.arange(B), 30)
    feats = (centers[assign] + 1e-3 * rng.standard_normal((len(assign), D))).astype(
        np.float32
    )
    pos_centers = rng.uniform(0, 40, (B, 2))
    pos = (pos_centers[assign] + 1e-3 * rng.standard_normal((len(assign), 2))).astype(
        np.float32
    )
    # 2 TMA cores per blob, right at the center
    tma = np.repeat(centers, 2, axis=0) + 1e-3 * rng.standard_normal((2 * B, D))
    tma = tma.astype(np.float32)

    ref_p, our_p = tmp_path / "ref.h5", tmp_path / "ours.h5"
    _write_h5(ref_p, feats, pos, tma)
    _write_h5(our_p, feats, pos, tma)
    _ref_build(ref_p, B, 4, 2, B)
    process_single_file(our_p, B, 4, 2, B)

    # kmeans cluster NUMBERING is arbitrary on both sides, so super-patch
    # node ids must be canonicalized to blob identity before comparing
    # structure: super j -> the blob whose center its features match.
    import h5py

    def canonical_edges(p):
        with h5py.File(p) as f:
            sp = np.asarray(f["hypergraph/wsi_super/features"])
            ei = np.asarray(f["hypergraph/edge_index"])
        d = ((sp[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        super_to_blob = d.argmin(1)  # [B]
        assert len(np.unique(super_to_blob)) == B  # clean recovery

        def node_name(i):
            return f"S{super_to_blob[i]}" if i < B else f"T{i - B}"

        e = ei.T
        e = e[e[:, 0] != e[:, 1]]
        return {tuple(sorted((node_name(a), node_name(b)))) for a, b in e}

    ref_edges, our_edges = canonical_edges(ref_p), canonical_edges(our_p)
    jac = _jaccard(ref_edges, our_edges)
    print(f"\nforced-structure edge Jaccard vs reference: {jac:.4f}  "
          f"(|ref|={len(ref_edges)}, |ours|={len(our_edges)})")
    assert jac >= 0.95  # floor recorded in PARITY.md


def test_edge_set_jaccard_realistic_vs_seed_sensitivity(tmp_path):
    """Loose fixture: the hyperedge partition of ~20 fusion nodes is
    genuinely seed-sensitive.  Yardstick: our own seed-to-seed Jaccard.
    ref-vs-ours must be in the same band (the two stacks differ only as two
    seeds of the same algorithm differ)."""
    from multimodal_fusion_tpu.hypergraph.build import process_single_file

    rng = np.random.default_rng(4)
    feats, assign = _blobs(rng, n=360, d=32, k=12)
    pos = rng.uniform(0, 4, (len(assign), 2)).astype(np.float32)
    tma = (rng.standard_normal((8, 32)) * 3.0).astype(np.float32)

    ref_p, a_p, b_p = tmp_path / "ref.h5", tmp_path / "a.h5", tmp_path / "b.h5"
    for p in (ref_p, a_p, b_p):
        _write_h5(p, feats, pos, tma)
    _ref_build(ref_p, 12, 4, 3, 5)
    process_single_file(a_p, 12, 4, 3, 5, seed=42)
    process_single_file(b_p, 12, 4, 3, 5, seed=7)

    ref_edges = _edges_of(ref_p)
    a_edges, b_edges = _edges_of(a_p), _edges_of(b_p)
    cross = _jaccard(ref_edges, a_edges)
    self_seed = _jaccard(a_edges, b_edges)
    print(f"\nrealistic edge Jaccard ref-vs-ours: {cross:.4f}; "
          f"ours seed42-vs-seed7: {self_seed:.4f}")
    # the cross-stack difference must be comparable to a seed change, not
    # categorically worse
    assert cross >= 0.6 * self_seed
