"""data/prefetch.py: the background input pipeline.

The reference overlaps input with compute via torch DataLoader workers
(/root/reference/training/coarse.py:176-201); our equivalent is a
single-worker prefetch generator that stages batches on-device while the
dispatched step runs. The contract under test: bitwise-identical training
(the worker preserves host-RNG draw order), bounded staging depth, and
faithful error propagation.
"""

import dataclasses
import threading

import numpy as np
import pytest

from text2loc_tpu.data.prefetch import maybe_prefetch, prefetch


def _rng_batches(seed, n):
    """Stateful generator — each draw depends on RNG order, like the real
    gather pipeline's close/negative/PMC sampling."""
    rng = np.random.default_rng(seed)

    def gen():
        for _ in range(n):
            yield rng.normal(size=(4,))

    return gen


def test_prefetch_preserves_stateful_order():
    serial = list(_rng_batches(3, 12)())
    staged = list(prefetch(_rng_batches(3, 12)(), put=lambda b: b * 2.0))
    assert len(staged) == 12
    for s, p in zip(serial, staged):
        np.testing.assert_array_equal(s * 2.0, p)


def test_prefetch_generator_exception_propagates():
    def bad():
        yield 1
        yield 2
        raise RuntimeError("gather failed")

    it = prefetch(bad(), depth=1)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="gather failed"):
        list(it)


def test_prefetch_put_exception_propagates():
    it = prefetch(iter([1, 2]), put=lambda b: 1 / 0)
    with pytest.raises(ZeroDivisionError):
        list(it)


def test_prefetch_early_exit_joins_worker():
    before = {t for t in threading.enumerate()}
    it = prefetch(iter(range(1000)), depth=2)
    assert next(it) == 0
    it.close()  # abandon mid-epoch (e.g. an exception in the train loop)
    leaked = [
        t for t in threading.enumerate()
        if t not in before and t.name == "text2loc-prefetch" and t.is_alive()
    ]
    assert not leaked


def test_prefetch_depth_bounds_staging():
    produced = []
    consumed = []
    lead = []

    def gen():
        for i in range(50):
            produced.append(i)
            yield i

    for item in prefetch(gen(), depth=2):
        lead.append(len(produced) - len(consumed))
        consumed.append(item)
    assert consumed == list(range(50))
    # At most depth in the queue + 1 being staged + 1 just yielded.
    assert max(lead) <= 2 + 2


def test_maybe_prefetch_env_kill_switch(monkeypatch):
    from text2loc_tpu.data import prefetch as prefetch_mod

    monkeypatch.setenv("TEXT2LOC_PREFETCH", "0")
    assert not prefetch_mod.prefetch_enabled()
    spawned = []
    orig = threading.Thread.start

    def spy(self, *a, **k):
        spawned.append(self.name)
        return orig(self, *a, **k)

    monkeypatch.setattr(threading.Thread, "start", spy)
    assert list(maybe_prefetch(iter([1, 2, 3]), put=lambda b: b + 1)) == [2, 3, 4]
    assert "text2loc-prefetch" not in spawned


def _tree_equal(a, b):
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


@pytest.mark.slow
def test_trainers_bitwise_equal_with_and_without_prefetch(
    small_cfg, small_embedder, small_data, monkeypatch
):
    """The flagship contract: prefetched training == serial training,
    bitwise, including the host-RNG-driven close-cell sampling."""
    from text2loc_tpu.training.coarse import train_coarse
    from text2loc_tpu.training.fine import train_fine

    cfg = small_cfg.replace(train=dataclasses.replace(
        small_cfg.train, epochs=2, batch_size=8, sample_close_cell=True,
    ))

    runs = {}
    for knob in ("1", "0"):
        monkeypatch.setenv("TEXT2LOC_PREFETCH", knob)
        cstate, _, clog = train_coarse(
            cfg, small_data, None, small_embedder
        )
        fstate, _, flog = train_fine(cfg, small_data, None, small_embedder)
        runs[knob] = (cstate, clog.history, fstate, flog.history)

    c1, cl1, f1, fl1 = runs["1"]
    c0, cl0, f0, fl0 = runs["0"]
    assert cl1 == cl0
    assert fl1 == fl0
    assert _tree_equal(c1.params, c0.params)
    assert _tree_equal(f1.params, f0.params)
    assert _tree_equal(c1.opt_state, c0.opt_state)
