"""SamplerConfig validation and defaults.

Mirrors the reference's test_config.py coverage (every validation rule,
computed defaults, immutability, target metric per mode, dynamic-mode
warning) against tempest_tpu/config.py.
"""

import warnings
from pathlib import Path

import pytest

from tempest_tpu.config import SamplerConfig


def _pt(u):
    return u


def _ll(x):
    return 0.0


def make(**kw):
    kw.setdefault("prior_transform", _pt)
    kw.setdefault("log_likelihood", _ll)
    kw.setdefault("n_dim", 3)
    return SamplerConfig(**kw)


class TestDefaults:
    def test_n_particles_default_is_2x_ndim(self):
        assert make().n_particles == 6

    def test_n_steps_defaults(self):
        c = make()
        assert c.n_steps == 1
        assert c.n_max_steps == 20

    def test_n_max_steps_scales_with_n_steps(self):
        c = make(n_steps=3)
        assert c.n_max_steps == 60

    def test_explicit_n_max_steps_kept(self):
        c = make(n_steps=2, n_max_steps=7)
        assert c.n_max_steps == 7

    def test_output_defaults(self):
        c = make()
        assert c.output_dir == Path("states")
        assert c.output_label == "ps"

    def test_output_dir_str_coerced_to_path(self):
        c = make(output_dir="/tmp/foo")
        assert c.output_dir == Path("/tmp/foo")

    def test_target_metric_ess_mode(self):
        c = make(n_particles=10, ess_ratio=3.0)
        assert c.get_target_metric() == 30.0

    def test_target_metric_dynamic_mode(self):
        c = make(volume_variation=0.25)
        assert c.get_target_metric() == 0.25

    def test_n_max_clusters_caps_k_max(self):
        c = make(n_max_clusters=5)
        assert c.k_max == 5


class TestImmutability:
    def test_frozen(self):
        c = make()
        with pytest.raises(AttributeError):
            c.n_dim = 5


class TestValidation:
    def test_noncallable_prior(self):
        with pytest.raises(ValueError, match="prior_transform"):
            make(prior_transform=42)

    def test_noncallable_likelihood(self):
        with pytest.raises(ValueError, match="log_likelihood"):
            make(log_likelihood="nope")

    def test_ndim_not_int(self):
        with pytest.raises(ValueError, match="n_dim"):
            make(n_dim=2.5)

    def test_ndim_nonpositive(self):
        with pytest.raises(ValueError, match="n_dim"):
            make(n_dim=0)

    def test_n_particles_not_int(self):
        with pytest.raises(ValueError, match="n_particles"):
            make(n_particles=3.7)

    def test_n_particles_nonpositive(self):
        with pytest.raises(ValueError, match="n_particles"):
            make(n_particles=-4)

    def test_ess_ratio_nonpositive(self):
        with pytest.raises(ValueError, match="ess_ratio"):
            make(ess_ratio=0)

    def test_ess_ratio_not_numeric(self):
        with pytest.raises(ValueError, match="ess_ratio"):
            make(ess_ratio="two")

    def test_volume_variation_negative(self):
        with pytest.raises(ValueError, match="volume_variation"):
            make(volume_variation=-0.1)

    def test_volume_variation_not_numeric(self):
        with pytest.raises(ValueError, match="volume_variation"):
            make(volume_variation="big")

    def test_invalid_sample(self):
        with pytest.raises(ValueError, match="tpcn.*rwm"):
            make(sample="hamiltonian")

    def test_negative_dispatch_budget_rejected(self):
        # -1.0 is the "config default" sentinel; any OTHER negative is a
        # typo and must not silently become the default.
        from tempest_tpu import Sampler

        with pytest.raises(ValueError, match="on_device_dispatch_budget_s"):
            Sampler(
                lambda u: u,
                lambda x: 0.0,
                n_dim=2,
                on_device_dispatch_budget_s=-5.0,
            )

    def test_invalid_resample(self):
        with pytest.raises(ValueError, match="mult.*syst"):
            make(resample="stratified")

    def test_vectorize_with_blobs_rejected(self):
        with pytest.raises(ValueError, match="blobs"):
            make(vectorize=True, blobs_dtype="float32")

    def test_periodic_reflective_overlap(self):
        with pytest.raises(ValueError, match="both periodic and reflective"):
            make(periodic=[0, 1], reflective=[1, 2])

    def test_periodic_index_out_of_range(self):
        with pytest.raises(ValueError, match="periodic"):
            make(periodic=[3])

    def test_reflective_index_negative(self):
        with pytest.raises(ValueError, match="reflective"):
            make(reflective=[-1])

    def test_output_label_not_str(self):
        with pytest.raises(ValueError, match="output_label"):
            make(output_label=7)

    def test_multiple_errors_all_listed(self):
        with pytest.raises(ValueError) as exc:
            make(ess_ratio=-1, sample="x", resample="y")
        msg = str(exc.value)
        assert "ess_ratio" in msg and "sample" in msg.lower() and "resample" in msg.lower()


class TestWarnings:
    def test_pool_warns(self):
        with pytest.warns(UserWarning, match="pool"):
            make(pool=4)

    def test_dynamic_mode_small_ensemble_warns(self):
        with pytest.warns(UserWarning, match="n_particles"):
            make(n_dim=8, n_particles=4, volume_variation=0.5)

    def test_no_warning_normal_config(self):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            make()
