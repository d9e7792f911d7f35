"""filterdb byte parity vs the reference binary across its modes.

Input: tests/golden/utils/selfres; goldens from
tools/make_filterdb_goldens.sh.
"""

import pathlib

from metaeuk_tpu.pipeline.filterdb import filterdb

HERE = pathlib.Path(__file__).parent
U = HERE / "golden" / "utils"
RES = str(U / "selfres")


def _eq(out, ref):
    for s in ("", ".index", ".dbtype"):
        assert pathlib.Path(f"{out}{s}").read_bytes() \
            == pathlib.Path(f"{ref}{s}").read_bytes(), f"{ref}{s}"


def test_extract_lines(tmp_path):
    filterdb(RES, str(tmp_path / "o"), extract_lines=2)
    _eq(tmp_path / "o", U / "f_lines")


def test_numeric_ge(tmp_path):
    filterdb(RES, str(tmp_path / "o"), filter_column=2,
             comp_operator="ge", comp_value=100)
    _eq(tmp_path / "o", U / "f_ge")


def test_numeric_le(tmp_path):
    filterdb(RES, str(tmp_path / "o"), filter_column=4,
             comp_operator="le", comp_value=1e-30)
    _eq(tmp_path / "o", U / "f_le")


def test_regex(tmp_path):
    filterdb(RES, str(tmp_path / "o"), filter_column=3,
             filter_regex=r"^0\.9")
    _eq(tmp_path / "o", U / "f_regex")


def test_trim_to_one_column(tmp_path):
    filterdb(RES, str(tmp_path / "o"), filter_column=2,
             trim_to_one_column=True)
    _eq(tmp_path / "o", U / "f_trim")


def test_sort_increasing(tmp_path):
    filterdb(RES, str(tmp_path / "o"), filter_column=2, sort_entries=1)
    _eq(tmp_path / "o", U / "f_sort_inc")


def test_sort_decreasing(tmp_path):
    filterdb(RES, str(tmp_path / "o"), filter_column=4, sort_entries=2)
    _eq(tmp_path / "o", U / "f_sort_dec")


def test_beats_first(tmp_path):
    filterdb(RES, str(tmp_path / "o"), filter_column=2, beats_first=True,
             comp_operator="ip", comp_value=0.5)
    _eq(tmp_path / "o", U / "f_beats")


def test_file_filter_positive(tmp_path):
    filterdb(RES, str(tmp_path / "o"), filter_file=str(U / "f_keys.txt"))
    _eq(tmp_path / "o", U / "f_file_pos")


def test_file_filter_negative(tmp_path):
    filterdb(RES, str(tmp_path / "o"), filter_file=str(U / "f_keys.txt"),
             positive_filter=False)
    _eq(tmp_path / "o", U / "f_file_neg")


def test_mapping(tmp_path):
    filterdb(RES, str(tmp_path / "o"), mapping_file=str(U / "f_map.tsv"))
    _eq(tmp_path / "o", U / "f_map")


def test_join_db(tmp_path):
    filterdb(RES, str(tmp_path / "o"), join_db=RES)
    _eq(tmp_path / "o", U / "f_join")


def test_expression(tmp_path):
    filterdb(RES, str(tmp_path / "o"), filter_expression="$2 > 150")
    _eq(tmp_path / "o", U / "f_expr")
