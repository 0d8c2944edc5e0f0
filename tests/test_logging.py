import json
import math

import numpy as np

from gaustar_tpu.utils.logging import MetricLogger, read_events, summarize, to_csv


def test_metric_logger_roundtrip(tmp_path):
    p = str(tmp_path / "events.jsonl")
    with MetricLogger(p, run_meta={"run": "unit", "n_faces": 4}) as lg:
        lg.log(1, loss=1.5, rgb_loss=1.0)
        lg.log(2, loss=float("nan"), rgb_loss=0.5, note="diverged")
        lg.log(3, loss=np.float32(0.25), rgb_loss=0.1)

    events = read_events(p)
    assert events[0]["event"] == "run_meta" and events[0]["n_faces"] == 4
    assert events[1]["step"] == 1 and events[1]["loss"] == 1.5
    assert events[2]["loss"] == "nan"  # non-finite stays visible, file stays JSON
    assert math.isclose(events[3]["loss"], 0.25)

    s = summarize(p)
    assert s["loss"]["count"] == 2 and s["loss"]["last"] == 0.25
    assert s["rgb_loss"]["min"] == 0.1 and s["rgb_loss"]["max"] == 1.0

    csv_path = str(tmp_path / "events.csv")
    tags = to_csv(p, csv_path)
    assert tags == ["loss", "rgb_loss"]
    lines = open(csv_path).read().strip().split("\n")
    assert lines[0] == "step,loss,rgb_loss"
    assert lines[2].startswith("2,,")  # nan -> empty cell


def test_logger_plugs_into_refine_log_fn(tmp_path):
    p = str(tmp_path / "refine.jsonl")
    with MetricLogger(p) as lg:
        fn = lg.as_log_fn()
        fn({"iteration": 50, "loss": 0.7, "rgb_loss": 0.6, "num_pairs": 1000})
    # events[0] is the auto run_meta (run separation, ADVICE r2); the first
    # STEP event follows it.
    e = [x for x in read_events(p) if "step" in x][0]
    assert e["step"] == 50 and e["num_pairs"] == 1000
    json.dumps(e)  # serializable end-to-end


def test_xla_trace_captures(tmp_path):
    import glob

    import jax.numpy as jnp

    from gaustar_tpu.utils.profiling import xla_trace

    d = str(tmp_path / "trace")
    with xla_trace(d) as tr:
        float(jnp.arange(8.0).sum())
    if tr.error is None:  # backend exported a trace
        assert glob.glob(d + "/**/*.xplane.pb", recursive=True)
