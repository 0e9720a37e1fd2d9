"""Loading through the real HuggingFace `datasets` library (offline: objects
and save_to_disk directories, the paths users actually hit)."""

import numpy as np
import pytest

from tst.data.adapters import load_benchmark
from tst.data.adapters._hf import load_rows


@pytest.fixture(scope="module")
def cv_rows():
    return [
        {"idx": i, "type": "2D", "task": "Count",
         "question": f"How many objects in image {i}?",
         "choices": ["1", "2", "3", "4"], "answer": f"({'ABCD'[i % 4]})",
         "source": "ADE20K"}
        for i in range(12)
    ]


class TestDatasetsLibrary:
    def test_in_memory_dataset_object(self, cv_rows):
        import datasets

        ds_obj = datasets.Dataset.from_list(cv_rows)
        bd = load_benchmark("cv_bench", source=ds_obj)
        assert len(bd) == 12
        assert bd[0].answer == "A"

    def test_save_to_disk_dir(self, cv_rows, tmp_path):
        import datasets

        d = str(tmp_path / "cvb")
        datasets.Dataset.from_list(cv_rows).save_to_disk(d)
        bd = load_benchmark("cv_bench", source=d)
        assert len(bd) == 12
        assert {s.answer for s in bd} == {"A", "B", "C", "D"}

    def test_save_to_disk_dict_with_split(self, cv_rows, tmp_path):
        import datasets

        d = str(tmp_path / "cvb2")
        datasets.DatasetDict(
            {"test": datasets.Dataset.from_list(cv_rows)}
        ).save_to_disk(d)
        bd = load_benchmark("cv_bench", source=d, split="test")
        assert len(bd) == 12

    def test_jsonl_file(self, cv_rows, tmp_path):
        import json

        p = str(tmp_path / "rows.jsonl")
        with open(p, "w") as f:
            for r in cv_rows:
                f.write(json.dumps(r) + "\n")
        rows = load_rows(p)
        assert len(list(rows)) == 12

    def test_parquet_file(self, cv_rows, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = str(tmp_path / "rows.parquet")
        pq.write_table(pa.Table.from_pylist(cv_rows), p)
        rows = load_rows(p)
        assert len(list(rows)) == 12

    def test_none_source_raises(self):
        with pytest.raises(ValueError, match="no dataset source"):
            load_rows(None)
