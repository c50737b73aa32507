"""Online micro-batching front end: concurrency, batching, and the
transparent-batching correctness claim (a query's result is independent of
its batchmates). The reference has no online serving path at all — its
evaluation loop is offline and per-pose (evaluation/pipeline.py:102-126)."""

import threading

import numpy as np
import pytest

from text2loc_tpu import constants as C
from text2loc_tpu.serving import Localizer
from text2loc_tpu.serving_frontend import BatchingFrontend

from test_serving import _states


@pytest.fixture(scope="module")
def localizer(small_cfg, small_embedder, small_data):
    cs, cm, fs, fm = _states(small_cfg, small_embedder, small_data)
    return Localizer(small_data, cs, cm, fs, fm, small_embedder, small_cfg,
                     top_k=3)


def _query(data, i):
    return (data.hint_dir[i], data.hint_color[i], data.hint_label[i])


def test_backlog_coalesces_into_one_dispatch(localizer, small_data):
    """5 queued single-query requests -> ONE localize dispatch whose rows
    match the direct batched call bit for bit (same bucket, same program)."""
    fe = BatchingFrontend(localizer, max_batch=8, max_wait_s=0.5, start=False)
    q = np.arange(5)
    futures = [fe.submit(*_query(small_data, i)) for i in q]
    fe.start()
    results = [f.result(timeout=300) for f in futures]
    fe.close()

    assert fe.stats.dispatches == 1
    assert fe.stats.requests == 5
    assert list(fe.stats.group_sizes) == [5]

    direct = localizer.localize(
        small_data.hint_dir[q], small_data.hint_color[q],
        small_data.hint_label[q],
        sentence_mask=np.ones((5,) + small_data.hint_dir[0].shape, bool),
    )
    for i, r in enumerate(results):
        np.testing.assert_array_equal(r.position_w, direct.position_w[i])
        np.testing.assert_array_equal(r.candidates_w, direct.candidates_w[i])
        np.testing.assert_array_equal(r.cell_indices, direct.cell_indices[i])
        np.testing.assert_array_equal(r.scores, direct.scores[i])


def test_batchmate_independence(localizer, small_data):
    """Transparent batching is only correct if a row's result doesn't depend
    on its batchmates: eval-mode BN uses running stats and attention is
    per-sample, so a query served in an 8-group must equal the same query
    served alone (different bucket => different XLA program => float
    tolerance, not bitwise)."""
    fe = BatchingFrontend(localizer, max_batch=8, max_wait_s=0.5, start=False)
    futures = [fe.submit(*_query(small_data, i)) for i in range(8)]
    fe.start()
    grouped = [f.result(timeout=300) for f in futures]
    fe.close()
    assert list(fe.stats.group_sizes) == [8]

    for i in (0, 3, 7):
        solo = localizer.localize(
            small_data.hint_dir[i : i + 1], small_data.hint_color[i : i + 1],
            small_data.hint_label[i : i + 1],
        )
        np.testing.assert_array_equal(grouped[i].cell_indices,
                                      solo.cell_indices[0])
        np.testing.assert_allclose(grouped[i].position_w, solo.position_w[0],
                                   atol=1e-3)
        np.testing.assert_allclose(grouped[i].scores, solo.scores[0],
                                   atol=1e-4)


def test_concurrent_threads_batch_under_load(localizer, small_data):
    """32 client threads, one query each, a generous coalescing window:
    correctness per thread plus evidence that the dispatcher actually
    batched (dispatches < requests)."""
    fe = BatchingFrontend(localizer, max_batch=32, max_wait_s=0.25)
    n = 32
    results = [None] * n
    errors = []

    def client(i):
        try:
            results[i] = fe.localize_one(*_query(small_data, i % 8),
                                         timeout=300)
        except Exception as e:  # noqa: BLE001
            errors.append((i, e))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    fe.close()

    assert not errors, errors
    assert fe.stats.requests == n
    assert fe.stats.dispatches < n, (
        f"no batching happened: {fe.stats.dispatches} dispatches for {n} "
        f"requests"
    )
    # Same query index -> same retrieval, regardless of which group served it.
    for i in range(n):
        np.testing.assert_array_equal(results[i].cell_indices,
                                      results[i % 8].cell_indices)


def test_text_front_door_and_mixed_kinds(localizer, small_data):
    """String requests ride the same dispatcher; mixed triple+text backlogs
    split into one dispatch per kind."""
    d0 = " ".join(
        C.render_hint(small_data.hint_dir[0][s], small_data.hint_color[0][s],
                      small_data.hint_label[0][s])
        for s in range(small_data.hint_dir.shape[1])
    )
    fe = BatchingFrontend(localizer, max_batch=8, max_wait_s=0.5, start=False)
    f_text = fe.submit_text(d0)
    f_trip = fe.submit(*_query(small_data, 1))
    fe.start()
    r_text = f_text.result(timeout=300)
    r_trip = f_trip.result(timeout=300)
    fe.close()
    assert fe.stats.dispatches == 2  # one per kind

    direct = localizer.localize_text([d0])
    np.testing.assert_array_equal(r_text.cell_indices, direct.cell_indices[0])
    np.testing.assert_allclose(r_text.position_w, direct.position_w[0],
                               atol=1e-3)
    assert r_trip.position_w.shape == (2,)


def test_ragged_hint_counts_batch_together(localizer, small_data):
    """Clients with DIFFERENT hint counts coalesce into one dispatch: every
    query is padded to the MODEL's native hint slot count with masked (0,0,0)
    slots (the text.parse_descriptions convention) — one constant sentence
    shape, no mid-serve recompiles — so the short query's result must match
    serving it alone (different bucket/program => float tolerance)."""
    s_full = small_data.hint_dir.shape[1]
    short = 2
    fe = BatchingFrontend(localizer, max_batch=8, max_wait_s=0.5, start=False)
    f_long = fe.submit(*_query(small_data, 0))
    f_short = fe.submit(
        small_data.hint_dir[1][:short], small_data.hint_color[1][:short],
        small_data.hint_label[1][:short],
    )
    fe.start()
    r_long = f_long.result(timeout=300)
    r_short = f_short.result(timeout=300)
    fe.close()
    assert fe.stats.dispatches == 1
    assert list(fe.stats.group_sizes) == [2]

    mask = np.zeros((1, s_full), bool)
    mask[0, :short] = True
    pad = np.zeros((1, s_full - short), np.int32)
    solo = localizer.localize(
        np.concatenate([small_data.hint_dir[1:2, :short], pad], axis=1),
        np.concatenate([small_data.hint_color[1:2, :short], pad], axis=1),
        np.concatenate([small_data.hint_label[1:2, :short], pad], axis=1),
        sentence_mask=mask,
    )
    np.testing.assert_array_equal(r_short.cell_indices, solo.cell_indices[0])
    np.testing.assert_allclose(r_short.position_w, solo.position_w[0],
                               atol=1e-3)
    np.testing.assert_allclose(r_short.scores, solo.scores[0], atol=1e-4)

    solo_long = localizer.localize(
        small_data.hint_dir[0:1], small_data.hint_color[0:1],
        small_data.hint_label[0:1],
    )
    np.testing.assert_array_equal(r_long.cell_indices,
                                  solo_long.cell_indices[0])
    np.testing.assert_allclose(r_long.position_w, solo_long.position_w[0],
                               atol=1e-3)


def test_bad_request_does_not_poison_batchmates(localizer, small_data):
    """A group containing one unparseable description fails ONLY that
    client: the dispatcher retries the failed group per-request, so the
    valid batchmate still gets its result (and the invalid one gets the
    parse error, not a batch-shaped mystery)."""
    d_good = " ".join(
        C.render_hint(small_data.hint_dir[0][s], small_data.hint_color[0][s],
                      small_data.hint_label[0][s])
        for s in range(small_data.hint_dir.shape[1])
    )
    fe = BatchingFrontend(localizer, max_batch=8, max_wait_s=0.5, start=False)
    f_good = fe.submit_text(d_good)
    f_bad = fe.submit_text("utter gibberish that parses to nothing")
    fe.start()
    r_good = f_good.result(timeout=300)
    with pytest.raises(Exception):
        f_bad.result(timeout=300)
    fe.close()

    direct = localizer.localize_text([d_good])
    np.testing.assert_array_equal(r_good.cell_indices,
                                  direct.cell_indices[0])
    # 1 group dispatch (failed) + 2 isolation retries.
    assert fe.stats.dispatches == 3
    assert fe.stats.requests == 2


def test_submit_validates_triple_shapes(localizer, small_data):
    """Mismatched hint arrays fail the CALLER at submit time instead of
    poisoning a dispatch group."""
    fe = BatchingFrontend(localizer, max_batch=4, start=False)
    with pytest.raises(ValueError, match="hint_color"):
        fe.submit(small_data.hint_dir[0], small_data.hint_color[0][:-1],
                  small_data.hint_label[0])
    with pytest.raises(ValueError, match="sentence_mask"):
        fe.submit(small_data.hint_dir[0], small_data.hint_color[0],
                  small_data.hint_label[0],
                  sentence_mask=np.ones(2, bool))
    assert fe.stats.requests == 0
    fe.close()


def test_close_and_error_paths(localizer, small_data):
    fe = BatchingFrontend(localizer, max_batch=4, max_wait_s=0.01)
    fe.localize_one(*_query(small_data, 0), timeout=300)
    fe.close()
    fe.close()  # idempotent
    with pytest.raises(RuntimeError):
        fe.submit(*_query(small_data, 0))
    # Batched input to the single-query API fails fast (client error, not a
    # dispatcher crash).
    fe2 = BatchingFrontend(localizer, max_batch=4)
    with pytest.raises(ValueError):
        fe2.submit(small_data.hint_dir[:2], small_data.hint_color[:2],
                   small_data.hint_label[:2])
    with pytest.raises(TypeError):
        fe2.submit_text(["a", "b"])
    fe2.close()
