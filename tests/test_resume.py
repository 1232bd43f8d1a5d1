"""Pipeline checkpoint/resume integration test on the bundled dataset."""

import os

import pytest

from telr_tpu.pipeline import run_pipeline

pytestmark = pytest.mark.e2e

DATA = "/root/reference/test"


def test_resume_reproduces_output(tmp_path):
    ck = str(tmp_path / "ckpt")
    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")
    res1 = run_pipeline(os.path.join(DATA, "reads.fasta"),
                        os.path.join(DATA, "ref_38kb.fasta"),
                        os.path.join(DATA, "library.fasta"),
                        out1, checkpoint_dir=ck)
    # second run resumes: alignment/te_filter/assembly restored
    res2 = run_pipeline(os.path.join(DATA, "reads.fasta"),
                        os.path.join(DATA, "ref_38kb.fasta"),
                        os.path.join(DATA, "library.fasta"),
                        out2, checkpoint_dir=ck)
    assert res2.final_report == res1.final_report
    # resumed alignment stage must be much faster than the cold one
    assert res2.stage_seconds["alignment"] < res1.stage_seconds["alignment"]
    assert res2.stage_seconds["assembly"] < res1.stage_seconds["assembly"]
    manifest = os.path.join(ck, "MANIFEST.json")
    assert os.path.isfile(manifest)
