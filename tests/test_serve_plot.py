"""Web UI (stdlib server) + plotting tests."""

import threading
import urllib.request

import numpy as np
import pytest

from music2midi_tpu.utils import numpy_to_midi


def test_plot_midi_sequence(tmp_path):
    midi = numpy_to_midi(
        np.array([[0.0, 0.5, 60, 80], [0.5, 1.0, 64, 90]])
    )
    from music2midi_tpu.plot_midi import plot_midi_sequence

    out = tmp_path / "roll.png"
    plot_midi_sequence(midi, path=out)
    assert out.stat().st_size > 1000


def test_plot_midi_evaluation(tmp_path):
    from music2midi_tpu.plot_midi import plot_midi_evaluation

    a = numpy_to_midi(np.array([[0.0, 1.0, 60, 80], [1.0, 2.0, 64, 80]]))
    b = numpy_to_midi(np.array([[0.0, 1.0, 60, 80], [1.0, 2.0, 67, 80]]))
    out = tmp_path / "eval.png"
    plot_midi_evaluation(a, b, path=out, melody_only=True)
    assert out.stat().st_size > 1000


def test_plot_interactive_sequence(tmp_path):
    """Standalone-HTML piano roll (bokeh-equivalent, reference
    plot_midi.py:138-260): embeds the notes as JSON + a canvas viewer."""
    from music2midi_tpu.plot_interactive import plot_midi_sequence_html

    midi = numpy_to_midi(
        np.array([[0.0, 0.5, 60, 80], [0.5, 1.0, 64, 90]])
    )
    out = tmp_path / "roll.html"
    html = plot_midi_sequence_html(midi, path=out, title="my song")
    assert out.read_text() == html
    assert "<canvas" in html and "my song" in html
    import json
    import re

    notes = json.loads(re.search(r"NOTES = (\[.*?\]), CLASSES", html).group(1))
    assert {n["p"] for n in notes} == {60, 64}
    assert all(n["t1"] > n["t0"] for n in notes)


def test_plot_interactive_evaluation(tmp_path):
    from music2midi_tpu.plot_interactive import plot_midi_evaluation_html

    a = numpy_to_midi(np.array([[0.0, 1.0, 60, 80], [1.0, 2.0, 64, 80]]))
    b = numpy_to_midi(np.array([[0.0, 1.0, 60, 80], [1.0, 2.0, 67, 80]]))
    html = plot_midi_evaluation_html(a, b, path=tmp_path / "eval.html")
    import json
    import re

    notes = json.loads(re.search(r"NOTES = (\[.*?\]), CLASSES", html).group(1))
    classes = json.loads(
        re.search(r"CLASSES = (\[.*?\]);", html).group(1)
    )
    assert [c["name"] for c in classes][:1] == ["TP"]
    # 60 matches (TP), 64 missed (FN), 67 extra (FP)
    by_class = {c: {n["p"] for n in notes if n["c"] == c} for c in (0, 1, 2)}
    assert 60 in by_class[0] and 64 in by_class[1] and 67 in by_class[2]


def test_plot_evaluation_empty_output(tmp_path):
    """An untrained model emitting zero notes must still produce a diff
    roll (regression: the empty-instrument (128, 0) roll crashed the
    target-vs-output comparison)."""
    from music2midi_tpu.plot_midi import plot_midi_evaluation
    from music2midi_tpu.plot_interactive import plot_midi_evaluation_html

    target = numpy_to_midi(np.array([[0.0, 1.0, 60, 80]]))
    empty = numpy_to_midi(np.zeros((0, 4)))
    plot_midi_evaluation(target, empty, path=tmp_path / "e.png")
    html = plot_midi_evaluation_html(target, empty)
    assert "FN" in html


def test_plot_training_curves(tmp_path):
    """tools/plot_training.py: parse a train.py log.jsonl (including a
    garbled line from a killed run) and render overlaid curves."""
    import json
    import runpy
    import sys

    for name, scale in (("runA", 1.0), ("runB", 0.8)):
        run = tmp_path / name
        run.mkdir()
        lines = []
        for step in range(100, 1100, 100):
            lines.append(json.dumps(
                {"step": step, "train/loss": scale * 100.0 / step}))
            if step % 500 == 0:
                lines.append(json.dumps({
                    "step": step, "val/loss": scale * 110.0 / step,
                    "val/is_best": True,
                }))
        lines.append('{"step": 1100, "train/l')  # torn tail write
        (run / "log.jsonl").write_text("\n".join(lines))

    from tools.plot_training import read_log

    curves = read_log(tmp_path / "runA")
    assert len(curves["train"]) == 10
    assert len(curves["val"]) == 2 and len(curves["best"]) == 2

    out = tmp_path / "curves.png"
    argv = ["plot_training.py", str(tmp_path / "runA"),
            str(tmp_path / "runB"), "--out", str(out)]
    old = sys.argv
    sys.argv = argv
    try:
        runpy.run_path("tools/plot_training.py", run_name="__main__")
    finally:
        sys.argv = old
    assert out.exists() and out.stat().st_size > 1000


def test_extract_melody():
    from music2midi_tpu.plot_midi import extract_melody_from_piano_roll

    roll = np.zeros((128, 4))
    roll[60, 0] = 80
    roll[64, 0] = 70
    roll[50, 2] = 90
    out = extract_melody_from_piano_roll(roll)
    assert out[64, 0] == 70 and out[60, 0] == 0
    assert out[50, 2] == 90


def test_piano_roll_to_notes():
    from music2midi_tpu.plot_midi import piano_roll_to_notes

    roll = np.zeros((128, 300))
    roll[60, 0:50] = 80
    roll[64, 100:200] = 90
    notes = piano_roll_to_notes(roll, fs=100)
    np.testing.assert_allclose(
        notes, [[0.0, 0.5, 60, 80], [1.0, 2.0, 64, 90]]
    )


@pytest.fixture(scope="module")
def webui_server(tmp_path_factory):
    """Spin up the real HTTP server with a random-weights engine."""
    import os

    import webui
    from http.server import ThreadingHTTPServer
    from music2midi_tpu.infer import Music2MIDI

    from music2midi_tpu.serve.batcher import DynamicBatcher

    webui.engine = Music2MIDI.from_random(seed=0, decode_max_length=16)
    webui.batcher = DynamicBatcher(webui.engine)  # production wiring
    cwd = tmp_path_factory.mktemp("webui")
    (cwd / "static" / "uploads").mkdir(parents=True)
    old = os.getcwd()
    os.chdir(cwd)
    from pathlib import Path

    webui.UPLOAD_DIR = Path("static/uploads")  # cwd-relative: URLs map 1:1
    server = ThreadingHTTPServer(("127.0.0.1", 0), webui.Handler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()
    webui.batcher.close()
    webui.batcher = None
    os.chdir(old)


def test_webui_index(webui_server):
    with urllib.request.urlopen(webui_server + "/") as r:
        body = r.read().decode()
    assert "Music2MIDI" in body and "form" in body


def test_webui_generate_wav_upload(webui_server):
    from music2midi_tpu.audio import write_wav
    import io

    buf = io.BytesIO()
    sr = 16000
    t = np.arange(2 * sr) / sr
    wave = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        write_wav(f.name, wave, sr)
        payload = open(f.name, "rb").read()
    os.unlink(f.name)

    boundary = "bndry123"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="url"\r\n\r\n\r\n'
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; '
        'filename="test.wav"\r\n'
        "Content-Type: audio/wav\r\n\r\n"
    ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        webui_server + "/generate",
        data=body,
        headers={
            "Content-Type": f"multipart/form-data; boundary={boundary}"
        },
    )
    with urllib.request.urlopen(req) as r:
        html = r.read().decode()
    assert "piano cover" in html
    assert "output.wav" in html
    # the generated preview is fetchable
    import re

    m = re.search(r'src="([^"]*output\.wav)"', html)
    assert m
    with urllib.request.urlopen(webui_server + m.group(1)) as r:
        wav = r.read()
    assert wav[:4] == b"RIFF"
    # the interactive piano roll is linked and fetchable
    m = re.search(r'href="([^"]*roll\.html)"', html)
    assert m
    with urllib.request.urlopen(webui_server + m.group(1)) as r:
        roll = r.read().decode()
    assert "<canvas" in roll and "NOTES" in roll


def test_webui_generate_empty_form(webui_server):
    boundary = "bndry123"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="url"\r\n\r\n\r\n'
        f"--{boundary}--\r\n"
    ).encode()
    req = urllib.request.Request(
        webui_server + "/generate",
        data=body,
        headers={
            "Content-Type": f"multipart/form-data; boundary={boundary}"
        },
    )
    with urllib.request.urlopen(req) as r:
        html = r.read().decode()
    assert "Please provide a URL or upload a file." in html
