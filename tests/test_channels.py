import pytest

from multimodal_fusion_tpu.channels import (
    TMA_MARKERS,
    parse_channels,
    get_available_channels,
    h5_path_for_channel,
)


def test_wsi_expansion():
    assert parse_channels(["wsi"]) == ["wsi=features", "wsi=reconstructed_features"]


def test_tma_expansion():
    assert parse_channels(["tma"]) == [f"tma={m}=features" for m in TMA_MARKERS]
    assert parse_channels(["cd3"]) == ["tma=cd3=features"]
    assert parse_channels(["cd3_patches"]) == ["tma=cd3=patches"]


def test_tabular_mask_expansion():
    assert parse_channels(["clinical_mask"]) == ["clinical=val", "clinical=mask"]
    assert parse_channels(["tma_cell_density_ori_mask"]) == [
        "tma_cell_density=ori_val",
        "tma_cell_density=mask",
    ]


def test_passthrough_and_invalid():
    assert parse_channels(["wsi=features"]) == ["wsi=features"]
    assert parse_channels([]) == []
    with pytest.raises(ValueError):
        parse_channels(["bogus"])


def test_order_and_duplicates_preserved():
    out = parse_channels(["cd3", "cd3"])
    assert out == ["tma=cd3=features", "tma=cd3=features"]


def test_h5_paths():
    assert h5_path_for_channel("tma=cd3=features") == "tma/cd3/features"
    assert h5_path_for_channel("wsi=features") == "wsi/features"


def test_available_channels_listing():
    avail = get_available_channels()
    assert "WSI channels" in avail
    all_names = [n for group in avail.values() for n in group]
    parse_channels(all_names)  # every advertised name must parse
