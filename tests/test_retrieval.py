import numpy as np

from speechclip_plus_tpu.ops import mutual_retrieval, recall_at_k


def _brute_force_recall(scores, q_ans, g_ans, k):
    hits = 0
    for i in range(scores.shape[0]):
        order = np.argsort(-scores[i], kind="stable")[:k]
        if any(g_ans[j] == q_ans[i] for j in order):
            hits += 1
    return hits / scores.shape[0] * 100.0


def test_recall_matches_bruteforce():
    rng = np.random.default_rng(0)
    NA, NB = 20, 7
    scores = rng.normal(size=(NA, NB))
    g_ans = np.arange(NB)
    q_ans = rng.integers(0, NB, size=NA)
    for k in [1, 3, 5, 10]:
        got = recall_at_k(scores, q_ans, g_ans, [k])[f"recall@{k}"]
        np.testing.assert_allclose(got, _brute_force_recall(scores, q_ans, g_ans, min(k, NB)))


def test_mutual_retrieval_perfect():
    # diagonal-dominant scores: every query retrieves its pair at rank 1
    N = 6
    scores = np.eye(N) * 10 + np.random.default_rng(1).normal(size=(N, N)) * 0.01
    ids = np.arange(N)
    AB, BA, mean = mutual_retrieval(scores, scores.T, ids, ids, [1, 5])
    assert AB["recall@1"] == 100.0
    assert BA["recall@1"] == 100.0
    assert mean["recall@5"] == 100.0


def test_mutual_retrieval_multiple_captions_per_image():
    # 4 audio (captions), 2 images; captions 0,1 -> image 0; 2,3 -> image 1
    a_ids = np.array([0, 0, 1, 1])
    img_ids = np.array([0, 1])
    score_audio = np.array(
        [[5.0, 1.0], [1.0, 5.0], [1.0, 5.0], [5.0, 1.0]]
    )  # captions 1 and 3 retrieve wrong image at rank1
    AB, BA, mean = mutual_retrieval(score_audio, score_audio.T, a_ids, img_ids, [1, 2])
    assert AB["recall@1"] == 50.0
    assert AB["recall@2"] == 100.0
    assert mean["recall@2"] == 100.0
