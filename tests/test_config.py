import json

import pytest

from ljmd_tpu.config import SimConfig, config_from_density, load_config, parse_reference_input

REFERENCE_INPUT = """\
# comment line
# Block 1
5   500000   100   5000
# Block 2
1.0D-4   10.0   0.49
# Block 3
-555.0
"""


def test_derived_params_default():
    cfg = SimConfig()
    assert cfg.n == 500  # N = 4 k^3 with k=5
    assert cfg.rc == pytest.approx(4.9)
    assert cfg.rc_square == pytest.approx(4.9**2)
    assert cfg.volume == pytest.approx(1000.0)
    assert cfg.density == pytest.approx(0.5)
    assert cfg.inv_box_length == pytest.approx(0.1)
    assert cfg.lattice_constant == pytest.approx(2.0)


def test_sampling_counts_match_reference_rule():
    cfg = SimConfig()
    # n = total//interval - warmup//interval (md_simulation_program.f90:254)
    assert cfg.n_samples == 500000 // 100 - 5000 // 100 == 4950
    # max_lag = min(1000, n-1, n//2) (md_simulation_program.f90:281-282)
    assert cfg.corr_max_lag == 1000
    # n_blocks = min(5, n // (lag+1)) (md_simulation_program.f90:475-476)
    assert cfg.corr_n_blocks() == 4
    tiny = cfg.replace(total_steps=300, output_interval=100, warmup_steps=100)
    assert tiny.n_samples == 2
    assert tiny.corr_max_lag == 1  # min(1000, 1, 1)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(num_cells=0),
        dict(total_steps=0),
        dict(output_interval=0),
        dict(warmup_steps=-1),
        dict(dt=0.0),
        dict(box_length=-1.0),
        dict(rc_over_box=0.0),
        dict(rc_over_box=0.6),
        dict(rc_over_box=0.5),  # rc == L/2 violates strict rc < L/2
        dict(dtype="bfloat16"),
    ],
)
def test_validation_rejects(kwargs):
    with pytest.raises(ValueError):
        SimConfig(**kwargs)


def test_parse_reference_input_text():
    cfg = parse_reference_input(REFERENCE_INPUT)
    assert cfg.num_cells == 5
    assert cfg.total_steps == 500000
    assert cfg.output_interval == 100
    assert cfg.warmup_steps == 5000
    assert cfg.dt == pytest.approx(1e-4)
    assert cfg.box_length == pytest.approx(10.0)
    assert cfg.rc_over_box == pytest.approx(0.49)
    assert cfg.target_total_energy == pytest.approx(-555.0)


def test_parse_actual_reference_file():
    cfg = load_config("/root/reference/inputs/input_simulation_parameters.txt")
    assert cfg.n == 500
    assert cfg.rc == pytest.approx(4.9)
    assert cfg.density == pytest.approx(0.5)


def test_load_json_config(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"num_cells": 4, "box_length": 8.0, "dtype": "float64"}))
    cfg = load_config(str(p))
    assert cfg.n == 256
    assert cfg.dtype == "float64"


def test_config_from_density():
    cfg = config_from_density(num_cells=4, density=0.8)
    assert cfg.n == 256
    assert cfg.density == pytest.approx(0.8)
    assert cfg.rc == pytest.approx(2.5)


def test_replace_recomputes_derived():
    cfg = SimConfig().replace(num_cells=4)
    assert cfg.n == 256


def test_hashable_and_static():
    cfg = SimConfig()
    assert hash(cfg) == hash(SimConfig())
    assert cfg == SimConfig()


def test_load_config_json_density_form(tmp_path):
    """JSON configs may specify the state point as density (+ optional rc)
    instead of box_length/rc_over_box."""
    import json
    from ljmd_tpu.config import config_from_density, load_config

    p = tmp_path / "c.json"
    p.write_text(json.dumps({
        "num_cells": 3, "density": 0.8442, "dt": 0.004,
        "total_steps": 100, "output_interval": 10, "warmup_steps": 10,
        "target_total_energy": -500.0,
    }))
    cfg = load_config(str(p))
    want = config_from_density(
        num_cells=3, density=0.8442, dt=0.004, total_steps=100,
        output_interval=10, warmup_steps=10, target_total_energy=-500.0,
    )
    assert cfg.box_length == want.box_length
    assert cfg.rc == want.rc

    p2 = tmp_path / "bad.json"
    p2.write_text(json.dumps({
        "num_cells": 3, "density": 0.8, "box_length": 10.0,
    }))
    import pytest
    with pytest.raises(ValueError, match="not both"):
        load_config(str(p2))
