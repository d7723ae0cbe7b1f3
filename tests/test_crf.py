"""CRF correctness: brute-force enumeration over all tag paths on tiny cases."""
import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodaltopicsegmentation_tpu.ops import crf as C


def _brute_force(params, emissions, length, num_real_tags):
    """Enumerate all paths of `length` over the real tags (no START/STOP mid-path)."""
    trans = np.asarray(params["transitions"])
    Cdim = trans.shape[0]
    start, stop = Cdim - 2, Cdim - 1
    emissions = np.asarray(emissions)

    def path_score(path):
        s = 0.0
        prev = start
        for t, tag in enumerate(path):
            s += trans[tag, prev] + emissions[t, tag]
            prev = tag
        s += trans[stop, prev]
        return s

    scores = {
        path: path_score(path)
        for path in itertools.product(range(num_real_tags), repeat=length)
    }
    logZ_all = None
    # partition includes paths over ALL tags incl start/stop (walls make them ~impossible
    # but the reference's forward algorithm does include them) — enumerate full tag set
    full = {
        path: path_score(path)
        for path in itertools.product(range(Cdim), repeat=length)
    }
    vals = np.array(list(full.values()))
    m = vals.max()
    logZ_all = m + np.log(np.exp(vals - m).sum())
    best_path = max(scores, key=scores.get)
    return logZ_all, best_path, scores[best_path], scores


@pytest.mark.parametrize("seed", [0, 5])
def test_forward_algorithm_matches_enumeration(seed):
    rng = jax.random.PRNGKey(seed)
    num_tags, L, B, D = 2, 4, 2, 3
    params = C.crf_params(rng, D, num_tags)
    feats = jax.random.normal(jax.random.PRNGKey(seed + 10), (B, L, D))
    emissions = feats @ params["fc_w"] + params["fc_b"]
    mask = jnp.ones((B, L))

    logZ = np.asarray(C.forward_algorithm(params, emissions, mask))
    for b in range(B):
        expected, *_ = _brute_force(params, emissions[b], L, num_tags)
        assert logZ[b] == pytest.approx(expected, rel=1e-4)


def test_gold_score_matches_enumeration():
    rng = jax.random.PRNGKey(1)
    num_tags, L, B, D = 2, 4, 2, 3
    params = C.crf_params(rng, D, num_tags)
    feats = jax.random.normal(jax.random.PRNGKey(2), (B, L, D))
    emissions = feats @ params["fc_w"] + params["fc_b"]
    mask = jnp.ones((B, L))
    tags = jnp.array([[0, 1, 0, 1], [1, 1, 0, 0]])

    gold = np.asarray(C.gold_score(params, emissions, tags, mask))
    for b in range(B):
        _, _, _, scores = _brute_force(params, emissions[b], L, num_tags)
        assert gold[b] == pytest.approx(scores[tuple(np.asarray(tags[b]))], rel=1e-4)


@pytest.mark.parametrize("seed", [0, 3, 7])
def test_viterbi_matches_enumeration(seed):
    rng = jax.random.PRNGKey(seed)
    num_tags, L, B, D = 2, 5, 3, 4
    params = C.crf_params(rng, D, num_tags)
    feats = jax.random.normal(jax.random.PRNGKey(seed + 20), (B, L, D))
    mask = jnp.ones((B, L))

    best_score, paths = C.viterbi_decode(params, feats, mask)
    emissions = feats @ params["fc_w"] + params["fc_b"]
    for b in range(B):
        _, bf_path, bf_score, _ = _brute_force(params, emissions[b], L, num_tags)
        assert np.asarray(best_score)[b] == pytest.approx(bf_score, rel=1e-4)
        np.testing.assert_array_equal(np.asarray(paths[b]), np.array(bf_path))


def test_viterbi_variable_lengths():
    rng = jax.random.PRNGKey(4)
    num_tags, L, B, D = 2, 6, 2, 4
    params = C.crf_params(rng, D, num_tags)
    feats = jax.random.normal(jax.random.PRNGKey(5), (B, L, D))
    lengths = np.array([6, 3])
    mask = jnp.asarray((np.arange(L)[None, :] < lengths[:, None]).astype(np.float32))

    best_score, paths = C.viterbi_decode(params, feats, mask)
    emissions = feats @ params["fc_w"] + params["fc_b"]
    # short sequence must match enumeration over its true length
    _, bf_path, bf_score, _ = _brute_force(params, emissions[1], 3, num_tags)
    assert np.asarray(best_score)[1] == pytest.approx(bf_score, rel=1e-4)
    np.testing.assert_array_equal(np.asarray(paths[1])[:3], np.array(bf_path))


def test_crf_loss_positive_and_decreases_for_gold():
    # loss = logZ - gold >= 0, and should be ~0 if emissions strongly favour gold
    rng = jax.random.PRNGKey(0)
    num_tags, L, B, D = 2, 4, 2, 4
    params = C.crf_params(rng, D, num_tags)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, L, D))
    tags = jnp.array([[0, 0, 1, 0], [1, 0, 0, 1]])
    mask = jnp.ones((B, L))
    loss = float(C.crf_loss(params, feats, tags, mask))
    assert loss > 0

    # grad check: loss decreases along its gradient
    g = jax.grad(lambda p: C.crf_loss(p, feats, tags, mask))(params)
    params2 = jax.tree.map(lambda p, gg: p - 0.1 * gg, params, g)
    loss2 = float(C.crf_loss(params2, feats, tags, mask))
    assert loss2 < loss
