"""TensorBoard event-file writer (utils/tboard.py) and MetricSink mirror."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from stratanet2_tpu.utils.tboard import (
    EventFileWriter,
    _crc32c,
    _masked_crc,
    read_events,
)


class TestCrc32c:
    def test_known_vector(self):
        # RFC 3720 test vector for CRC32C (Castagnoli)
        assert _crc32c(b"123456789") == 0xE3069283

    def test_mask_rotation(self):
        # TensorFlow's masking: ((crc >> 15) | (crc << 17)) + 0xa282ead8
        crc = _crc32c(b"hello")
        want = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert _masked_crc(b"hello") == want


class TestEventFile:
    def test_roundtrip(self, tmp_path):
        w = EventFileWriter(str(tmp_path))
        w.add_scalar("train/loss", 0.5, step=1)
        w.add_scalar("train/loss", 0.25, step=2)
        w.add_scalar("val/MAE", 0.125, step=2)
        w.close()
        events = read_events(w.path)
        assert ("train/loss", np.float32(0.5), 1) == events[0]
        assert events[1][1] == np.float32(0.25) and events[1][2] == 2
        assert events[2][0] == "val/MAE"

    def test_negative_step_roundtrip(self, tmp_path):
        # Regression: the SSL path logs with step = fold_id = -1; naive varint
        # encoding of a negative Python int loops forever (unbounded shift).
        w = EventFileWriter(str(tmp_path))
        w.add_scalar("ssl/val_MAE", 0.75, step=-1)
        w.close()
        events = read_events(w.path)
        assert events[0] == ("ssl/val_MAE", np.float32(0.75), -1)

    def test_metricsink_mirrors_scalars(self, tmp_path):
        from stratanet2_tpu.utils.experiment import MetricSink

        sink = MetricSink(str(tmp_path))
        with sink.context("fold_1_train"):
            sink.log_metrics({"total_loss": 0.3, "note": "str-skipped"}, epoch=3, step=12)
        sink.close()
        files = glob.glob(os.path.join(str(tmp_path), "tb", "events.out.tfevents.*"))
        assert len(files) == 1
        events = read_events(files[0])
        tags = [e[0] for e in events]
        assert "fold_1_train/total_loss" in tags
        assert not any("note" in t for t in tags)

    def test_opt_out_env(self, tmp_path, monkeypatch):
        from stratanet2_tpu.utils.experiment import MetricSink

        monkeypatch.setenv("STRATANET2_NO_TENSORBOARD", "1")
        sink = MetricSink(str(tmp_path))
        sink.log_metrics({"x": 1.0})
        sink.close()
        assert not os.path.isdir(os.path.join(str(tmp_path), "tb"))

    def test_histogram_roundtrip(self, tmp_path):
        """HistogramProto framing: the record passes CRC validation and
        carries the tag (reference Comet log_histogram_3d counterpart)."""
        w = EventFileWriter(str(tmp_path))
        vals = np.concatenate([np.zeros(5), np.linspace(0, 1, 50)])
        w.add_histogram("val/MAE_hist", vals, step=3)
        w.add_scalar("after", 1.0, step=3)
        w.close()
        events = read_events(w.path)  # CRC-checked framing
        tags = [e[0] for e in events]
        assert "val/MAE_hist" in tags and "after" in tags

    def test_histogram_decodes_with_real_tensorboard_protos(self, tmp_path):
        """Decode with tensorboard's own event_pb2: the Value must carry a
        HISTO (field 5 — field 4 is Image, an encoding bug TB would render
        as an empty image summary) with correct bucket fields (6/7)."""
        event_pb2 = pytest.importorskip("tensorboard.compat.proto.event_pb2")

        w = EventFileWriter(str(tmp_path))
        vals = np.linspace(0.0, 1.0, 100)
        w.add_histogram("val/hist", vals, step=7, bins=10)
        w.close()
        import struct as st

        with open(w.path, "rb") as f:
            records = []
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    break
                (length,) = st.unpack("<Q", hdr)
                f.read(4)
                records.append(f.read(length))
                f.read(4)
        ev = event_pb2.Event.FromString(records[1])
        val = ev.summary.value[0]
        assert val.tag == "val/hist"
        assert val.WhichOneof("value") == "histo"
        h = val.histo
        assert h.num == 100 and len(h.bucket) == 10
        assert len(h.bucket_limit) == 10
        assert abs(sum(h.bucket) - 100) < 1e-9
        assert abs(h.sum - float(vals.sum())) < 1e-6
        assert ev.step == 7

    def test_metricsink_log_histogram(self, tmp_path):
        from stratanet2_tpu.utils.experiment import MetricSink

        sink = MetricSink(str(tmp_path))
        with sink.context("fold_1_val"):
            sink.log_histogram("val_MAE_veg_b", [0.1, 0.2, 0.3], epoch=4)
        sink.close()
        import json

        recs = [json.loads(l) for l in open(os.path.join(str(tmp_path), "metrics.jsonl"))]
        keys = [k for r in recs for k in r["metrics"]]
        assert "val_MAE_veg_b_hist_counts" in keys
        files = glob.glob(os.path.join(str(tmp_path), "tb", "events.out.tfevents.*"))
        events = read_events(files[0])
        assert any(e[0] == "fold_1_val/val_MAE_veg_b" for e in events)

    def test_log_histogram_explicit_bins_are_stable_across_calls(self, tmp_path):
        """Explicit bin edges (learning/evaluate.log_mae_histograms passes
        linspace(0,1,21)) make the JSONL counts comparable across folds —
        the recorded edges must be the passed ones, not the data range."""
        import json

        import numpy as np

        from stratanet2_tpu.utils.experiment import MetricSink

        edges = np.linspace(0.0, 1.0, 21)
        sink = MetricSink(str(tmp_path))
        sink.log_histogram("val_MAE_veg_b", [0.11, 0.12], epoch=1, bins=edges)
        sink.log_histogram("val_MAE_veg_b", [0.7, 0.95], epoch=2, bins=edges)
        sink.close()
        recs = [
            json.loads(l)
            for l in open(os.path.join(str(tmp_path), "metrics.jsonl"))
        ]
        hist = [r["metrics"] for r in recs if "val_MAE_veg_b_hist_bins" in r["metrics"]]
        assert len(hist) == 2
        for h in hist:
            np.testing.assert_allclose(h["val_MAE_veg_b_hist_bins"], edges)
            assert sum(h["val_MAE_veg_b_hist_counts"]) == 2


class TestProjectorExport:
    def test_write_projector_embedding(self, tmp_path):
        """Projector TSVs + config stanza (reference Comet projector,
        learning/test.py:152-163): vectors round-trip through the TSV and
        repeated writes don't duplicate the config stanza."""
        import numpy as np

        from stratanet2_tpu.utils.tboard import write_projector_embedding

        vec = np.arange(12, dtype=np.float32).reshape(3, 4) / 7.0
        labels = ["P1", "P2", "P3"]
        tb = str(tmp_path / "tb")
        path = write_projector_embedding(tb, "sa3_global_fold_1", vec, labels)
        back = np.loadtxt(path, delimiter="\t", dtype=np.float32)
        np.testing.assert_array_equal(back, vec)
        meta = open(os.path.join(tb, "sa3_global_fold_1_metadata.tsv")).read().split()
        assert meta == labels

        # second write (per-epoch refresh) overwrites TSVs, no dup stanza
        write_projector_embedding(tb, "sa3_global_fold_1", vec + 1, labels)
        cfg = open(os.path.join(tb, "projector_config.pbtxt")).read()
        assert cfg.count('tensor_name: "sa3_global_fold_1"') == 1
        # a different fold appends a second stanza
        write_projector_embedding(tb, "sa3_global_fold_2", vec, labels)
        cfg = open(os.path.join(tb, "projector_config.pbtxt")).read()
        assert cfg.count("embeddings {") == 2

    def test_evaluate_exports_projector(self, tmp_path):
        """log_embeddings=True on the last epoch writes the npz AND the
        projector TSVs from the real eval loop (reference logs the SA3
        global feature to Comet's projector, learning/test.py:152-163)."""
        from dataclasses import replace

        import jax
        import numpy as np

        from stratanet2_tpu.learning.kde import fit_kde_mixture
        from stratanet2_tpu.learning.evaluate import evaluate
        from stratanet2_tpu.learning.train import make_eval_step
        from stratanet2_tpu.models import init_pointnet2
        from stratanet2_tpu.utils.experiment import MetricSink
        from tests.synthetic import make_plot_dataset, tiny_config

        rng = np.random.default_rng(0)
        cfg = replace(tiny_config(), log_embeddings=True)
        dataset = make_plot_dataset(rng, n_plots=4)
        model = init_pointnet2(jax.random.PRNGKey(0), cfg.model)
        kde = fit_kde_mixture(rng.uniform(0, 20, 2000))
        sink = MetricSink(str(tmp_path))
        evaluate(
            model, dataset, list(dataset), cfg, kde, make_eval_step(cfg, kde),
            str(tmp_path), sink, fold_id=1, epoch=2, last_epoch=True,
        )
        sink.close()
        emb = np.load(os.path.join(str(tmp_path), "embeddings_fold_1.npz"))
        assert emb["embeddings"].shape == (4, 64)  # SA3 global feature
        tb = os.path.join(str(tmp_path), "tb")
        vecs = np.loadtxt(
            os.path.join(tb, "sa3_global_fold_1_vectors.tsv"), delimiter="\t"
        )
        np.testing.assert_allclose(vecs, emb["embeddings"], rtol=1e-6)
        cfg_txt = open(os.path.join(tb, "projector_config.pbtxt")).read()
        assert 'tensor_name: "sa3_global_fold_1"' in cfg_txt
