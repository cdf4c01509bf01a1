"""Misc coverage: legacy npy ingestion, dataset IO roundtrip, int8
quantized edge MLPs, config loading, logging."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.config import Config, from_dict, load_config
from diffusion_model_tpu.data.batch import collate
from diffusion_model_tpu.data.io import load_dataset, resize_spectra, save_dataset
from diffusion_model_tpu.data.legacy import npy_to_graphs
from diffusion_model_tpu.data.synthetic import synthetic_sio2_dataset
from diffusion_model_tpu.nn import DiffusionDenoiser
from diffusion_model_tpu.utils.logging import RunLogger, load_run_config


class TestLegacyNpy:
    def test_npy_to_graphs(self, rng):
        records = [
            ("mp-1", rng.random(20), [
                ([1, 0], [0.0, 0, 0]), ([0, 1], [1.6, 0, 0]),
            ]),
            ("mp-2", rng.random(20), [([1, 0], [0.0, 0, 0])]),  # CN0 drop
        ]
        graphs = npy_to_graphs(records)
        assert len(graphs) == 1
        g = graphs[0]
        assert g["id"] == "mp-1"
        assert g["pos"].shape == (2, 3)
        # every node carries the spectrum (legacy layout)
        np.testing.assert_allclose(g["spectrum"][0], g["spectrum"][1])


class TestDatasetIO:
    def test_roundtrip(self, tmp_path):
        ds = synthetic_sio2_dataset(0, 4, n_max=10, spectrum_size=16)
        path = str(tmp_path / "ds.npz")
        save_dataset(ds, path)
        back = load_dataset(path)
        assert len(back) == 4
        for a, b in zip(ds, back):
            np.testing.assert_allclose(a["pos"], b["pos"])
            assert a["id"] == b["id"]

    def test_resize_spectra(self):
        ds = synthetic_sio2_dataset(0, 2, n_max=10, spectrum_size=32)
        out = resize_spectra(ds, 16)
        assert out[0]["spectrum"].shape[1] == 16


class TestQuantizedEdgeMLP:
    def test_close_to_f32_path(self, rng):
        # zero_init_x=False so eps_x is non-trivial at init
        cfg = Config(n_max=10, L=2, m_hidden_size=64, h_hidden_size=64,
                     x_hidden_size=64, m_size=32, spectrum_size=16,
                     compressed_spectrum_size=8, compressor_hidden_dim=(8,),
                     zero_init_x=False)
        graphs = synthetic_sio2_dataset(0, 2, cfg.n_max,
                                        spectrum_size=cfg.spectrum_size)
        batch = collate(graphs, cfg.n_max)
        b, n = batch.mask.shape
        t0 = jnp.full((b, n, 1), 0.4) * batch.mask[..., None]
        args = (batch.species, batch.pos, batch.spectrum, batch.exo, t0,
                batch.mask, batch.pair_mask())
        model = DiffusionDenoiser(cfg)
        params = model.init(jax.random.key(0), *args)
        a = model.apply(params, *args)
        q = DiffusionDenoiser(cfg.replace(quantize_edge_mlp=True)).apply(
            params, *args
        )
        for i in range(2):
            af = np.asarray(a[i]).ravel()
            qf = np.asarray(q[i]).ravel()
            cos = np.dot(af, qf) / (
                np.linalg.norm(af) * np.linalg.norm(qf) + 1e-12
            )
            assert cos > 0.999, cos


class TestConfigIO:
    def test_reference_yaml_loads(self):
        cfg = load_config("configs/parameters.yaml")
        assert cfg.L == 5
        assert cfg.h_size == 36  # 2 + 32 + 1 + 1
        assert cfg.m_input_size == 73
        assert cfg.h_input_size == 292
        assert cfg.optimizer == "RAdamScheduleFree"

    def test_from_dict_ignores_unknown(self):
        cfg = from_dict({"L": 3, "wandb_run_id": "abc"})
        assert cfg.L == 3


class TestRunLogger:
    def test_roundtrip(self, tmp_path):
        cfg = Config(L=3)
        run_dir = str(tmp_path / "run")
        logger = RunLogger(run_dir, cfg, notes="hello")
        logger.log({"loss": 1.5}, step=0)
        logger.register_artifact("model", "/tmp/x.pth")
        assert logger.artifact("model") == "/tmp/x.pth"
        cfg2 = load_run_config(run_dir)
        assert cfg2.L == 3
        with open(os.path.join(run_dir, "metrics.jsonl")) as f:
            rec = json.loads(f.readline())
        assert rec["loss"] == 1.5
