"""Unified config: dotted overrides, file load, reproducibility dump,
matrix file writers (reference: param structs' operator<< Agent.h:150-185;
writeMatrixToFile/writeSparseMatrixToFile DCORA_utils.cpp:147-177)."""

import json

import numpy as np
import pytest
import scipy.sparse as sp

from dcora_tpu.config import DcoraConfig
from dcora_tpu.types import RobustCostType
from dcora_tpu.utils.logger import (
    read_matrix_from_file,
    read_sparse_matrix_from_file,
    write_matrix_to_file,
    write_sparse_matrix_to_file,
)


def test_defaults_match_reference():
    cfg = DcoraConfig()
    d = dict(cfg.items())
    # reference defaults (DCORA_robust.h:53-63, Agent.h:119-123,
    # MultiRobotExample.cpp:123-133)
    assert d["robust.GNCBarc"] == 5.0
    assert d["robust.GNCMuStep"] == 1.4
    assert d["robust.GNCInitMu"] == 1e-4
    assert d["rbcd.rel_change_tol"] == 5e-3
    assert d["rbcd.max_num_iters"] == 500
    assert d["rbcd.restart_interval"] == 30
    assert d["staircase.min_eig_num_tol"] == 1e-3
    assert d["rbcd.rgrad_norm_tol"] == 0.1


def test_dotted_overrides_and_coercion():
    cfg = DcoraConfig()
    cfg.override("ropt.gradnorm_tol", "1e-6")
    cfg.override("staircase.r_max", "12")
    cfg.override("rbcd.acceleration", "false")
    cfg.override("robust.costType", "GNC_TLS")
    assert cfg.ropt.gradnorm_tol == 1e-6
    assert cfg.staircase.r_max == 12
    assert cfg.rbcd.acceleration is False
    assert cfg.robust.costType == RobustCostType.GNC_TLS
    with pytest.raises(KeyError):
        cfg.override("staircase.nope", "1")
    with pytest.raises(KeyError):
        cfg.override("nogroup.x", "1")
    with pytest.raises(ValueError):
        cfg.override("robust.costType", "NOT_A_COST")
    # the dump names every leaf with its current value
    dump = cfg.dump()
    assert "staircase.r_max = 12" in dump
    assert "robust.costType = GNC_TLS" in dump


def test_config_file_then_cli_override(tmp_path):
    path = tmp_path / "run.json"
    path.write_text(json.dumps({
        "ropt.RTR_iterations": 50, "staircase.r_min": 3,
    }))

    class A:
        config = str(path)
        config_overrides = ["staircase.r_min=4"]

    cfg = DcoraConfig.from_cli(A())
    assert cfg.ropt.RTR_iterations == 50
    assert cfg.staircase.r_min == 4  # CLI wins over file


def test_matrix_file_writers_roundtrip(tmp_path):
    M = np.random.default_rng(0).standard_normal((5, 3))
    p = str(tmp_path / "m.csv")
    write_matrix_to_file(M, p)
    np.testing.assert_array_equal(read_matrix_from_file(p), M)

    S = sp.random(20, 20, density=0.1, random_state=1, format="csr")
    ps = str(tmp_path / "s.csv")
    write_sparse_matrix_to_file(S, ps)
    S2 = read_sparse_matrix_from_file(ps)
    np.testing.assert_array_equal(S2.toarray(), S.toarray()[:S2.shape[0],
                                                            :S2.shape[1]])
