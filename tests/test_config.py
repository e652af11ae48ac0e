"""Config system tests: @argfile carry-over from reference experiment files."""

import textwrap

from bts_tpu.config import Config, config_to_argfile, parse_args


def test_parse_reference_style_argfile(tmp_path):
    # Mirrors pytorch/arguments_train_nyu.txt structure.
    argfile = tmp_path / "arguments_train_nyu.txt"
    argfile.write_text(
        textwrap.dedent(
            """\
            --mode train
            --model_name bts_nyu_v2
            --encoder densenet161_bts
            --dataset nyu
            --data_path ../dataset/nyu_depth_v2/sync/
            --gt_path ../dataset/nyu_depth_v2/sync/
            --filenames_file ../train_test_inputs/nyudepthv2_train_files_with_gt.txt
            --batch_size 4
            --num_epochs 50
            --learning_rate 1e-4
            --weight_decay 1e-2
            --adam_eps 1e-3
            --num_threads 1
            --input_height 416
            --input_width 544
            --max_depth 10
            --do_random_rotate
            --degree 2.5
            --log_directory ./models/
            """
        )
    )
    cfg = parse_args([str(argfile)])  # single positional = argfile
    assert cfg.model_name == "bts_nyu_v2"
    assert cfg.batch_size == 4
    assert cfg.learning_rate == 1e-4
    assert cfg.adam_eps == 1e-3
    assert cfg.input_height == 416 and cfg.input_width == 544
    assert cfg.do_random_rotate is True
    assert cfg.do_kb_crop is False
    assert cfg.max_depth == 10.0


def test_parse_plain_flags():
    cfg = parse_args(["--dataset", "kitti", "--do_kb_crop", "--max_depth", "80"])
    assert cfg.dataset == "kitti"
    assert cfg.do_kb_crop
    assert cfg.max_depth == 80.0
    assert cfg.depth_mask_min == 1.0


def test_depth_mask_min_nyu():
    assert Config(dataset="nyu").depth_mask_min == 0.1


def test_end_lr_default_rule():
    # Reference: end_lr == -1 means 0.1 * lr (pytorch/bts_main.py:423).
    cfg = Config(learning_rate=2e-4)
    assert cfg.resolved_end_learning_rate == 2e-5
    cfg2 = Config(learning_rate=2e-4, end_learning_rate=5e-6)
    assert cfg2.resolved_end_learning_rate == 5e-6


def test_argfile_roundtrip(tmp_path):
    cfg = Config(dataset="kitti", do_kb_crop=True, batch_size=16, degree=1.0)
    f = tmp_path / "args.txt"
    f.write_text(config_to_argfile(cfg))
    cfg2 = parse_args([str(f)])
    assert cfg2 == cfg


def test_default_true_bool_can_be_disabled(tmp_path):
    # fast_tail defaults True; --no-fast_tail must turn it off from the CLI
    # and from args files, and config_to_argfile must round-trip it.
    assert Config().fast_tail
    cfg = parse_args(["--no-fast_tail"])
    assert not cfg.fast_tail
    f = tmp_path / "args.txt"
    f.write_text(config_to_argfile(cfg))
    cfg2 = parse_args([str(f)])
    assert cfg2 == cfg
    # Bare flag still sets True (reference store_true semantics).
    assert parse_args(["--fast_tail"]).fast_tail


def test_validate_rejects_typod_enums():
    """A mistyped --dataset must fail at the CLI boundary instead of
    silently running with the other dataset's depth scaling/masking
    (config.Config.validate; parse_args calls it)."""
    import pytest

    with pytest.raises(ValueError, match="dataset"):
        parse_args(["--dataset", "kittti"])
    with pytest.raises(ValueError, match="remat_policy"):
        parse_args(["--remat_policy", "all"])
    with pytest.raises(ValueError, match="remat_scope"):
        parse_args(["--remat_scope", "decoder"])
    with pytest.raises(ValueError, match="lpg_impl"):
        parse_args(["--lpg_impl", "cuda"])
    with pytest.raises(ValueError, match="model_flavor"):
        parse_args(["--model_flavor", "torch"])
    # Valid combinations pass through.
    assert parse_args(["--dataset", "kitti", "--lpg_impl", "pallas"]).dataset == "kitti"
