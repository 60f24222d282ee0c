"""CLI entry point (python -m pcornet_data_curation_spark) — the
reference's run-program analog (sasprograms/01-04_run_*.sas)."""

import json

from pcornet_data_curation_spark.__main__ import main


def test_cli_gen_run_resume(spark, tmp_path, capsys):
    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")

    assert main(["gen-pages", "--n", "300", "--output", pages, "--cores", "8"]) == 0
    gen = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert gen["rows"] == 300

    base = ["--input", pages, "--output", out, "--buckets", "4", "--cores", "8"]
    assert main(["run", *base]) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["stats"]["buckets_processed_now"] == 4

    assert main(["resume", *base]) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["stats"]["buckets_processed_now"] == 0  # nothing recomputed
    assert second["stats"]["rows"] == first["stats"]["rows"]
