"""Utility-layer tests: logger levels, reports, comm helpers, profiling."""
import os

import numpy as np

from ubpl_tpu.utils import Logger, RunReport, json_save, json_load
from ubpl_tpu.utils import comm
from ubpl_tpu.utils.profiling import StepTimer, PhaseTimer
from ubpl_tpu.utils.draw import draw_kps_image


def test_logger_levels(tmp_path, capsys):
    lg = Logger("exp", base_path=str(tmp_path), console_level="L1")
    lg.print("L1", "headline")
    lg.print("L3", "detail")
    out = capsys.readouterr().out
    assert "headline" in out and "detail" not in out  # console filters L3
    l1 = open(tmp_path / "logs" / "log_L1.log").read()
    l3 = open(tmp_path / "logs" / "log_L3.log").read()
    assert "headline" in l1 and "detail" not in l1   # L1 file: only L1
    assert "headline" in l3 and "detail" in l3       # L3 file: everything


def test_run_report(tmp_path):
    rep = RunReport(["epoch", "acc"])
    rep.add_row(epoch=1, acc=0.3)
    rep.add_row(epoch=2, acc=0.7)
    rep.add_row(epoch=3, acc=0.5)
    assert rep.best_row_idx("acc") == 1
    rep.to_csv(str(tmp_path / "r.csv"), highlight_column="acc")
    lines = open(tmp_path / "r.csv").read().splitlines()
    assert lines[2].endswith("*")
    md = rep.to_markdown(highlight_column="acc")
    assert "**0.7**" in md


def test_comm_helpers(tmp_path):
    assert comm.math_signal(3) == 1
    assert comm.math_signal(0) == 0
    assert comm.math_signal(-2) == -1
    p = tmp_path / "a" / "b.txt"
    comm.folder_ensure(str(tmp_path / "a"))
    p.write_text("x")
    assert comm.file_isfile(str(p))
    assert comm.file_split_filename(str(p)) == "b"
    assert comm.file_scan(str(tmp_path / "a" / "*.txt")) == [str(p)]


def test_json_roundtrip(tmp_path):
    path = str(tmp_path / "d.json")
    json_save({"a": np.float32(1.5), "b": np.arange(3)}, path, is_cover=True)
    d = json_load(path)
    assert d["a"] == 1.5 and d["b"] == [0, 1, 2]
    json_save({"a": 99}, path, is_cover=False)  # no overwrite
    assert json_load(path)["a"] == 1.5


def test_timers():
    st = StepTimer(warmup=1)
    for _ in range(4):
        with st:
            pass
    s = st.summary()
    assert s["steps"] == 3 and s["mean_s"] >= 0
    pt = PhaseTimer()
    with pt.phase("train"):
        pass
    assert "train" in pt.summary()


def test_draw_kps():
    img = draw_kps_image(np.zeros((32, 32, 3)), [[10, 10, 1], [5, 5, 0]],
                         pck_ref=(0,))
    assert img.shape == (32, 32, 3)
    assert img.sum() > 0  # something drawn


def test_run_report_xlsx(tmp_path):
    """Reference xlsx artifact (utils/base/comm.py:105-173) without openpyxl:
    valid OOXML zip, best cell of the highlight column filled."""
    import zipfile
    import xml.dom.minidom
    from ubpl_tpu.utils.report import RunReport
    rep = RunReport(["epoch", "loss", "acc"])
    rep.add_row(epoch=1, loss=0.5, acc=0.1)
    rep.add_row(epoch=2, loss=0.3, acc=0.42)
    path = str(tmp_path / "r.xlsx")
    rep.to_xlsx(path, highlight_column="acc")
    z = zipfile.ZipFile(path)
    for n in z.namelist():
        if n.endswith(".xml"):
            xml.dom.minidom.parseString(z.read(n))
    sheet = z.read("xl/worksheets/sheet1.xml").decode()
    assert "<v>0.42</v>" in sheet and 's="2"' in sheet


def test_xlsx_nonfinite_cells(tmp_path):
    """NaN/inf metrics (e.g. zero-count validation averages) must emit as
    inline strings — <v>nan</v> is invalid OOXML (ADVICE r2)."""
    import zipfile
    import xml.dom.minidom
    from ubpl_tpu.utils.report import RunReport
    rep = RunReport(["epoch", "loss", "acc"])
    rep.add_row(epoch=1, loss=float("nan"), acc=float("inf"))
    rep.add_row(epoch=2, loss=0.3, acc=0.42)
    path = str(tmp_path / "r.xlsx")
    rep.to_xlsx(path, highlight_column="epoch")
    z = zipfile.ZipFile(path)
    sheet = z.read("xl/worksheets/sheet1.xml").decode()
    xml.dom.minidom.parseString(sheet)
    assert "<v>nan</v>" not in sheet and "<v>inf</v>" not in sheet
    assert "<t>nan</t>" in sheet and "<t>inf</t>" in sheet
