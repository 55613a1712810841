"""Small tools: train/val splitter (reference
data/random_split_train_val.py) and the profiling hooks."""

import os

from squeezedet_tpu.tools.random_split_train_val import split


def test_random_split_partitions_trainval(tmp_path):
    ids = ["{:06d}".format(i) for i in range(11)]
    with open(tmp_path / "trainval.txt", "w") as f:
        f.write("\n".join(ids) + "\n")
    split(str(tmp_path), seed=0)
    train = open(tmp_path / "train.txt").read().split()
    val = open(tmp_path / "val.txt").read().split()
    # 50/50 partition, disjoint, covering, each sorted
    assert len(train) == 5 and len(val) == 6
    assert sorted(train + val) == ids
    assert not set(train) & set(val)
    assert train == sorted(train) and val == sorted(val)


def test_random_split_seed_determinism(tmp_path):
    ids = ["{:06d}".format(i) for i in range(8)]
    with open(tmp_path / "trainval.txt", "w") as f:
        f.write("\n".join(ids) + "\n")
    split(str(tmp_path), seed=7)
    first = open(tmp_path / "train.txt").read()
    split(str(tmp_path), seed=7)
    assert open(tmp_path / "train.txt").read() == first


def test_step_tracer_window(tmp_path, monkeypatch):
    """StepTracer starts/stops the profiler exactly over [start, stop)."""
    import squeezedet_tpu.utils.profiling as prof

    calls = []
    monkeypatch.setattr("jax.profiler.start_trace",
                        lambda d: calls.append(("start", d)))
    monkeypatch.setattr("jax.profiler.stop_trace",
                        lambda: calls.append(("stop",)))
    t = prof.StepTracer(str(tmp_path / "tr"), start=3, stop=5)
    for step in range(8):
        t.on_step(step)
    assert calls == [("start", str(tmp_path / "tr")), ("stop",)]


def test_trace_context_manager(tmp_path):
    from squeezedet_tpu.utils.profiling import trace
    d = str(tmp_path / "prof")
    with trace(d):
        import jax.numpy as jnp
        jnp.ones((4,)).block_until_ready()
    assert os.path.isdir(d)
