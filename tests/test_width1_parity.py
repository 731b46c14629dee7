"""Width-1-escape parity: the one-task legs of kendall_tau and
wl_refinement must agree bit-for-bit with their grid/exchange plans
on the real sf0.001 tables (the same discipline as
test_lp_exchange_parity)."""

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_kendall_exchange_path_matches_local(ray_session):
    import readur_ray.pipelines.analytics as an

    local = an.kendall_tau(SF)
    an.KT_LOCAL_MAX = 0
    try:
        grid = an.kendall_tau(SF)
    finally:
        an.KT_LOCAL_MAX = 2_000_000
    assert local.equals(grid)


def test_wl_exchange_path_matches_local(ray_session):
    import readur_ray.pipelines.similarity as sim

    local = sim.wl_refinement(SF)
    sim.WL_LOCAL_MAX = 0
    try:
        ex = sim.wl_refinement(SF)
    finally:
        sim.WL_LOCAL_MAX = 2_000_000
    assert local.equals(ex)


def test_cvm_exchange_path_matches_local(ray_session):
    import readur_ray.pipelines.analytics as an

    local = an.cramer_von_mises(SF)
    an.CVM_LOCAL_MAX = 0
    try:
        grid = an.cramer_von_mises(SF)
    finally:
        an.CVM_LOCAL_MAX = 2_000_000
    assert local.equals(grid)


def test_varint_grid_path_matches_local(ray_session):
    import readur_ray.pipelines.analytics as an

    local = an.varint_cost_audit(SF)
    an.VARINT_LOCAL_MAX = 0
    try:
        grid = an.varint_cost_audit(SF)
    finally:
        an.VARINT_LOCAL_MAX = 2_000_000
    assert local.equals(grid)


def test_bfs_exchange_path_matches_local(ray_session):
    import readur_ray.pipelines.similarity as sim

    local = sim.bfs_layers(SF)
    sim.BFS_LOCAL_MAX = 0
    try:
        ex = sim.bfs_layers(SF)
    finally:
        sim.BFS_LOCAL_MAX = 2_000_000
    assert local.equals(ex)


def test_spearman_exchange_path_matches_local(ray_session):
    import readur_ray.pipelines.analytics as an

    local = an.spearman_corr(SF)
    an.KT_LOCAL_MAX = 0
    try:
        grid = an.spearman_corr(SF)
    finally:
        an.KT_LOCAL_MAX = 2_000_000
    assert local.equals(grid)


def test_census_exchange_path_matches_local(ray_session):
    import readur_ray.pipelines.similarity as sim

    local = sim.triangle_census(SF)
    sim.CENSUS_LOCAL_MAX = 0
    try:
        grid = sim.triangle_census(SF)
    finally:
        sim.CENSUS_LOCAL_MAX = 1_000_000
    assert local.equals(grid)


def test_sort_key_planner_grid_matches_local(ray_session):
    import readur_ray.pipelines.analytics as an

    local = an.sort_key_planner(SF)
    an.SKP_LOCAL_MAX = 0
    try:
        grid = an.sort_key_planner(SF)
    finally:
        an.SKP_LOCAL_MAX = 2_000_000
    assert local.equals(grid)


def test_tukey_grid_path_matches_local(ray_session):
    import readur_ray.pipelines.analytics as an

    local = an.tukey_fences(SF)
    an.TUKEY_LOCAL_MAX = 0
    try:
        grid = an.tukey_fences(SF)
    finally:
        an.TUKEY_LOCAL_MAX = 2_000_000
    assert local.equals(grid)


def test_k_core_exchange_path_matches_local(ray_session):
    # The grid path pays a fixed 3-exchange barrier per peel round;
    # parity runs a reduced (k=2, 2-round) configuration so the test
    # exercises every exchange type (degree census, v-drop, u-drop,
    # round chaining) without 12 rounds of barrier cost.
    import readur_ray.pipelines.similarity as sim

    sim.K_CORE_KS = (2,)
    sim.K_CORE_ROUNDS = 2
    try:
        local = sim.k_core_peel(SF)
        sim.K_CORE_LOCAL_MAX = 0
        grid = sim.k_core_peel(SF)
    finally:
        sim.K_CORE_LOCAL_MAX = 2_000_000
        sim.K_CORE_KS = (2, 3)
        sim.K_CORE_ROUNDS = 6
    assert local.equals(grid)


def test_dtc_contraction_path_matches_local(ray_session):
    import readur_ray.pipelines.dedup as dd

    local = dd.dedup_threshold_curve(SF)
    dd.DTC_LOCAL_MAX = 0
    try:
        grid = dd.dedup_threshold_curve(SF)
    finally:
        dd.DTC_LOCAL_MAX = 2_000_000
    assert local.equals(grid)


def test_pfor_grid_path_matches_local(ray_session):
    import readur_ray.pipelines.analytics as an

    local = an.pfor_exception_audit(SF)
    an.PFOR_LOCAL_MAX = 0
    try:
        grid = an.pfor_exception_audit(SF)
    finally:
        an.PFOR_LOCAL_MAX = 2_000_000
    assert local.equals(grid)


def test_bip_contraction_path_matches_local(ray_session):
    import readur_ray.pipelines.similarity as sim

    local = sim.bipartiteness_audit(SF)
    sim.BIP_LOCAL_MAX = 0
    try:
        grid = sim.bipartiteness_audit(SF)
    finally:
        sim.BIP_LOCAL_MAX = 2_000_000
    assert local.equals(grid)


def test_siegel_tukey_grid_path_matches_local(ray_session):
    import readur_ray.pipelines.analytics as an

    local = an.siegel_tukey(SF)
    an.ST_LOCAL_MAX = 0
    try:
        grid = an.siegel_tukey(SF)
    finally:
        an.ST_LOCAL_MAX = 2_000_000
    assert local.equals(grid)


def test_attack_curve_contraction_matches_local(ray_session):
    import readur_ray.pipelines.similarity as sim

    local = sim.attack_robustness_curve(SF)
    sim.ATK_LOCAL_MAX = 0
    try:
        grid = sim.attack_robustness_curve(SF)
    finally:
        sim.ATK_LOCAL_MAX = 2_000_000
    assert local.equals(grid)
