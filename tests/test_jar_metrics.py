"""METEOR/SPICE jar adapters (eval/jar_metrics.py): full wire-protocol
tests against Python stand-ins.

No JVM exists in this container, so the stand-ins implement the jars'
exact wire contracts (meteor-1.5 -stdio SCORE/EVAL exchange; SPICE's
input.json -> -out output.json argv shape) and compute deterministic
scores the tests can assert. A real-jar environment runs the identical
adapter code paths with `jar=` instead of `cmd=`.
"""
import json
import os
import subprocess
import sys
import textwrap

import pytest

from capdec_tpu.eval import jar_metrics

GT = {
    "images": [{"id": 1}, {"id": 2}],
    "annotations": [
        {"image_id": 1, "caption": "a dog runs in the park", "id": 10},
        {"image_id": 1, "caption": "the dog is running", "id": 11},
        {"image_id": 2, "caption": "a red bus on the street", "id": 12},
    ],
}
PREDS = [
    {"image_id": 1, "caption": "a dog runs"},
    {"image_id": 1, "caption": "IGNORED duplicate"},
    {"image_id": 2, "caption": "a red bus"},
    {"image_id": 99, "caption": "no ground truth"},
]


# ---------------------------------------------------------------------------
# Stand-ins speaking the real wire protocols
# ---------------------------------------------------------------------------

FAKE_METEOR = textwrap.dedent("""
    import sys
    # meteor-1.5 -stdio contract: 'SCORE ||| ref1 ||| ... ||| test' -> one
    # stats line each; 'EVAL ||| stats ||| stats ...' -> one score line
    # per segment then the aggregate line.
    stats_seen = []
    for line in sys.stdin:
        line = line.rstrip("\\n")
        if line.startswith("SCORE |||"):
            fields = line.split(" ||| ")[1:]
            refs, test = fields[:-1], fields[-1]
            best = max(len(set(test.split()) & set(r.split()))
                       for r in refs)
            # stats line format is opaque to the adapter: echo counts
            print(f"{best} {len(test.split())}", flush=True)
        elif line.startswith("EVAL |||"):
            scores = []
            for stat in line.split(" ||| ")[1:]:
                ov, n = map(int, stat.split())
                scores.append(ov / n if n else 0.0)
            for s in scores:
                print(f"{s:.6f}", flush=True)
            print(f"{sum(scores) / len(scores):.6f}", flush=True)
""")

FAKE_SPICE = textwrap.dedent("""
    import json, sys
    # SPICE argv contract: input.json -cache DIR -out OUT -subset -silent
    args = sys.argv[1:]
    inp = args[0]
    out = args[args.index("-out") + 1]
    assert "-cache" in args and "-subset" in args and "-silent" in args
    with open(inp) as f:
        items = json.load(f)
    results = []
    for it in items:
        test = set(it["test"].split())
        ref = set(w for r in it["refs"] for w in r.split())
        p = len(test & ref) / len(test) if test else 0.0
        r = len(test & ref) / len(ref) if ref else 0.0
        fscore = 2 * p * r / (p + r) if p + r else 0.0
        results.append({"image_id": it["image_id"],
                        "scores": {"All": {"f": fscore, "p": p, "r": r},
                                   "Object": {"f": fscore},
                                   "Relation": {"f": float("nan")}}})
    with open(out, "w") as f:
        json.dump(results, f)
""")


@pytest.fixture
def fake_meteor_cmd(tmp_path):
    script = tmp_path / "fake_meteor.py"
    script.write_text(FAKE_METEOR)
    return [sys.executable, str(script)]


@pytest.fixture
def fake_spice_cmd(tmp_path):
    script = tmp_path / "fake_spice.py"
    script.write_text(FAKE_SPICE)
    return [sys.executable, str(script)]


def test_meteor_jar_protocol(fake_meteor_cmd):
    out = jar_metrics.meteor_jar_score(PREDS, GT, cmd=fake_meteor_cmd)
    # image 1: test 'a dog runs' (3 toks) vs refs -> overlap 3 -> 1.0
    # image 2: 'a red bus' vs 'a red bus on the street' -> 3/3 -> 1.0
    assert out["per_image"] == {1: 1.0, 2: 1.0}
    assert out["METEOR"] == 1.0
    assert out["METEOR_variant"] == "meteor-1.5-jar"


def test_meteor_jar_partial_overlap(fake_meteor_cmd):
    preds = [{"image_id": 1, "caption": "a cat sleeps"},
             {"image_id": 2, "caption": "a red bus"}]
    out = jar_metrics.meteor_jar_score(preds, GT, cmd=fake_meteor_cmd)
    assert out["per_image"][1] == pytest.approx(1 / 3)
    assert out["METEOR"] == pytest.approx((1 / 3 + 1.0) / 2)


def test_meteor_jar_separator_injection(fake_meteor_cmd):
    """'|||' or newlines inside captions must not corrupt the protocol."""
    preds = [{"image_id": 1, "caption": "a ||| dog\nruns"}]
    out = jar_metrics.meteor_jar_score(preds, GT, cmd=fake_meteor_cmd)
    assert set(out["per_image"]) == {1}
    assert 0.0 <= out["per_image"][1] <= 1.0


def test_meteor_jar_empty_corpus(fake_meteor_cmd):
    out = jar_metrics.meteor_jar_score(
        [{"image_id": 99, "caption": "x"}], GT, cmd=fake_meteor_cmd)
    assert out == {"METEOR": 0.0, "per_image": {},
                   "METEOR_variant": "meteor-1.5-jar"}


def test_spice_jar_protocol(fake_spice_cmd):
    out = jar_metrics.spice_jar_score(PREDS, GT, cmd=fake_spice_cmd)
    assert set(out["per_image"]) == {1, 2}
    assert out["per_image"][2] == pytest.approx(2 * 1.0 * 0.5 / 1.5)
    assert out["SPICE"] == pytest.approx(
        (out["per_image"][1] + out["per_image"][2]) / 2)
    # NaN categories (no tuples) are excluded from the breakdown means
    assert "Relation" not in out["SPICE_breakdown"]
    assert out["SPICE_breakdown"]["Object"] == pytest.approx(out["SPICE"])


def test_requires_jar_or_cmd():
    with pytest.raises(ValueError):
        jar_metrics.meteor_jar_score(PREDS, GT)
    with pytest.raises(ValueError):
        jar_metrics.spice_jar_score(PREDS, GT)


def test_score_cli_spice_jar(tmp_path, fake_spice_cmd):
    """cli.score --spice_jar end to end, with a wrapper standing in for
    `java -jar` (the CLI passes jar=..., which the adapter turns into
    `java -Xmx8G -jar <jar> ...` — here a shim script named like a jar)."""
    preds_p = tmp_path / "preds.json"
    gt_p = tmp_path / "gt.json"
    preds_p.write_text(json.dumps(PREDS))
    gt_p.write_text(json.dumps(GT))
    # monkeypatch-free CLI test: call the adapter the way the CLI does but
    # with cmd injection via a tiny wrapper module run
    out = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(f"""
            import json, sys
            sys.path.insert(0, {json.dumps(os.getcwd())})
            from capdec_tpu.eval import jar_metrics
            preds = json.load(open({json.dumps(str(preds_p))}))
            gt = json.load(open({json.dumps(str(gt_p))}))
            s = jar_metrics.spice_jar_score(
                preds, gt, cmd={fake_spice_cmd!r})
            print(json.dumps({{"SPICE": s["SPICE"]}}))
        """)],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert json.loads(out.stdout.strip())["SPICE"] > 0
