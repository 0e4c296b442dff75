"""CLI parity of the `-volume [FILE] X Y Z SCALE` argument
(`MultiVolumes.cpp:559-568`: optional file into source 0, then
positional placement floats, any trailing subset)."""

from multivolumes_tpu.app import build_arg_parser, parse_volume_arg


def _parse_volume(tokens):
    args = build_arg_parser().parse_args(["--volume", *tokens])
    return parse_volume_arg(args.volume)


def test_volume_numbers_only():
    f, ps = _parse_volume(["1", "2", "3", "20"])
    assert f is None
    assert ps == [1.0, 2.0, 3.0, 20.0]


def test_volume_file_and_placement():
    f, ps = _parse_volume(["smoke.dds", "0", "-9", "0", "5"])
    assert f == "smoke.dds"
    assert ps == [0.0, -9.0, 0.0, 5.0]


def test_volume_file_partial_floats_keep_defaults():
    # the reference only overwrites as many components as are present
    f, ps = _parse_volume(["smoke.dds", "1.5"])
    assert f == "smoke.dds"
    assert ps == [1.5, 0.0, 0.0, 10.0]


def test_volume_file_only():
    f, ps = _parse_volume(["smoke.dds"])
    assert f == "smoke.dds"
    assert ps == [0.0, 0.0, 0.0, 10.0]
