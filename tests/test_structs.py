"""Config/MDRF schema round-trip tests, including loading the reference
config schema shape (same field names as /root/reference/config/*.json)."""

import json

from metdetpy_tpu.structs import (MDRF, BasicInfo, BinaryCfg, Box, DLCfg,
                                  MainDetectCfg, MDTarget, SingleMDRecord,
                                  from_dict)
from metdetpy_tpu.utils import relative2abs_path


def test_box_from_list_orders_coords():
    b = Box.from_list([10, 20, 3, 5])
    assert (b.x1, b.y1, b.x2, b.y2) == (3, 5, 10, 20)
    b2 = Box.from_list([-5, 1, 4, 9])
    assert b2.x1 == 0  # clamped at zero


def test_main_cfg_roundtrip_m3det():
    cfg = MainDetectCfg.from_json_file(
        relative2abs_path("./config/m3det_normal.json"))
    assert cfg.loader.grayscale is True
    assert isinstance(cfg.detector.cfg, BinaryCfg)
    assert cfg.detector.cfg.hough_line.threshold == 10
    assert cfg.collector.meteor_cfg.thre2 == 2048
    # round-trip through dict
    cfg2 = MainDetectCfg.from_dict(cfg.to_dict())
    assert cfg2.to_dict() == cfg.to_dict()


def test_main_cfg_union_discrimination_dldet():
    cfg = MainDetectCfg.from_json_file(relative2abs_path("./config/dldet.json"))
    assert isinstance(cfg.detector.cfg, DLCfg)
    assert cfg.detector.cfg.model.name == "YOLOModel"


def test_union_discrimination_is_shape_scored():
    """Union members are picked by required-field coverage + overlap score,
    not first-successful-build, so a DLCfg dict can never be swallowed by
    BinaryCfg (and vice versa) even with extra keys present."""
    import dataclasses
    import typing

    import pytest

    from metdetpy_tpu import structs

    @dataclasses.dataclass
    class A(structs.DictAble):
        shared: int
        only_a: int = 0

    @dataclasses.dataclass
    class B(structs.DictAble):
        shared: int
        only_b: int = 0

    @dataclasses.dataclass
    class Holder(structs.DictAble):
        cfg: typing.Union[A, B]

    # typing.get_type_hints must resolve the local names
    structs._HINTS_CACHE[Holder] = {"cfg": typing.Union[A, B]}
    built = structs._build(typing.Union[A, B], {"shared": 1, "only_b": 2})
    assert isinstance(built, B) and built.only_b == 2
    built = structs._build(typing.Union[A, B], {"shared": 1, "only_a": 3})
    assert isinstance(built, A) and built.only_a == 3
    with pytest.raises(structs.StructError, match="ambiguous"):
        structs._build(typing.Union[A, B], {"shared": 1})


def test_mdrf_roundtrip():
    tgt = MDTarget(
        start_frame=10, start_time="00:00:01.000", end_time="00:00:02.000",
        last_activate_frame=25, last_activate_time="00:00:02.000",
        duration=16, speed=3.2, dist=48.0, fix_dist=5.0, fix_speed=12.0,
        fix_motion_duration=0.6, fix_duration=0.64, num_pts=9,
        category="METEOR", pt1=[10, 10], pt2=[58, 40], drct_loss=0.01,
        score=0.9, real_dist=96.0, center_point_list=[[34, 25]])
    rec = SingleMDRecord.from_target(tgt, [960, 540])
    mdrf = MDRF(version="test", basic_info=BasicInfo(
        loader="BlockVideoLoader", video="v.mp4", mask=None, start_time=0,
        end_time=4000, resolution=[1920, 1080],
        runtime_resolution=[960, 540], exp_time=0.04, total_frames=100,
        fps=25.0), config=None, type="prediction", anno_size=[1920, 1080],
        results=[rec])
    blob = json.loads(json.dumps(mdrf.to_dict()))
    mdrf2 = from_dict(MDRF, blob)
    assert mdrf2.results[0].target[0].category == "METEOR"
    assert mdrf2.basic_info.fps == 25.0
    # full=False drops center_point_list (exclude_attrs semantics)
    slim = rec.target[0].to_dict(full=False)
    assert "center_point_list" not in slim and "pt1" in slim
