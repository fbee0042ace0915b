"""Config public API: reference parameter names, dict/YAML loading."""

import dataclasses
import math

import pytest

from tpuslam.core import config
from tpuslam.core.config import (
    HectorConfig,
    KartoConfig,
    PlicpConfig,
    from_dict,
    from_yaml,
    outdoor_karto_config,
)


def test_reference_parameter_names_present():
    # spot-check the de-facto public API: names must match the reference YAML
    k = {f.name for f in dataclasses.fields(KartoConfig)}
    for name in [
        "minimum_travel_distance", "minimum_travel_heading",
        "scan_buffer_size", "correlation_search_space_dimension",
        "loop_search_maximum_distance", "loop_match_minimum_chain_size",
        "coarse_angle_resolution", "use_response_expansion", "solver_type",
    ]:
        assert name in k, name
    p = {f.name for f in dataclasses.fields(PlicpConfig)}
    for name in [
        "max_angular_correction_deg", "max_linear_correction",
        "outliers_maxPerc", "use_point_to_line_distance", "kf_dist_linear",
    ]:
        assert name in p, name


def test_from_dict_and_unknown_key():
    c = from_dict("hector", {"map_size": 256, "map_resolution": 0.1})
    assert c.map_size == 256 and c.map_resolution == 0.1
    with pytest.raises(KeyError):
        from_dict("hector", {"map_sizee": 256})


def test_from_yaml_roundtrip(tmp_path):
    p = tmp_path / "mapper.yaml"
    p.write_text(
        "minimum_travel_distance: 0.5\n"
        "scan_buffer_size: 110\n"
        "loop_search_maximum_distance: 15.0\n"
    )
    c = from_yaml("karto", p)
    assert c.minimum_travel_distance == 0.5
    assert c.scan_buffer_size == 110
    assert c.loop_search_maximum_distance == 15.0


def test_outdoor_preset_matches_reference_yaml():
    c = outdoor_karto_config()
    # mapper_params_outdoor.yaml values
    assert c.scan_buffer_size == 110
    assert c.loop_search_space_dimension == 15.0
    assert c.loop_match_minimum_response_coarse == 0.35
    assert c.loop_match_minimum_response_fine == 0.45
    # the node passes the RAW yaml value (karto_slam.cc:216-219) despite the
    # yaml comment claiming a degree conversion; squared -> 0.01 rad^2
    assert c.angle_variance_penalty == 0.1
    assert math.isclose(c.angle_variance_penalty**2, 0.01)


def test_defaults_match_reference():
    p = PlicpConfig()
    assert p.max_iterations == 10 and p.outliers_maxPerc == 0.90
    h = HectorConfig()
    assert h.map_resolution == 0.05 and h.map_multi_res_levels == 3
    assert h.update_factor_free == 0.4 and h.update_factor_occupied == 0.9


def test_karto_library_defaults_pinned():
    """KartoConfig defaults mirror the LIBRARY defaults (Mapper.cpp:
    1448-1964) — what a user gets with no YAML.  The outdoor preset
    mirrors mapper_params_outdoor.yaml instead."""
    from tpuslam.core.config import KartoConfig, outdoor_karto_config

    cfg = KartoConfig()
    assert cfg.link_match_minimum_response_fine == 0.8  # Mapper.cpp:1517
    assert cfg.link_scan_maximum_distance == 10.0  # Mapper.cpp:1523
    assert cfg.use_response_expansion is False  # Mapper.cpp:1960
    assert cfg.scan_buffer_size == 70
    assert cfg.loop_search_maximum_distance == 4.0
    out = outdoor_karto_config()
    assert out.link_match_minimum_response_fine == 0.1
    assert out.link_scan_maximum_distance == 1.5
    assert out.use_response_expansion is True
    # angle penalty: raw 0.1 from the yaml, NOT degree-converted
    # (karto_slam.cc:218-219 squares the raw value)
    assert out.angle_variance_penalty == 0.1
