"""jobs/flagship_job.py — the `ray job submit` entrypoint — runs inside
an existing session (the job-driver case) and prints one JSON line."""

import importlib.util
import json
import sys

import pytest


@pytest.mark.usefixtures("ray_session")
def test_flagship_job_main(capsys, tmp_path):
    spec = importlib.util.spec_from_file_location(
        "flagship_job", "/root/repo/jobs/flagship_job.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out_dir = str(tmp_path / "out")
    rc = mod.main(
        [
            "--input",
            "/root/testdata/sf0.001/documents.parquet",
            "--out",
            out_dir,
            "--shards",
            "8",
        ]
    )
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    row = json.loads(line)
    assert row["docs_in"] == 500
    assert 0 < row["docs_out"] <= row["docs_in"]
    assert len(row["corpus_md5_xor"]) == 16
    assert (tmp_path / "out").is_dir()
    shards = list((tmp_path / "out").glob("shard=*"))
    assert shards and len(shards) <= 8
