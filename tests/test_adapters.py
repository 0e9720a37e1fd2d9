"""Adapter row-conversion tests on fixture rows mimicking the released
HF schemas (offline; no network in this environment — SURVEY.md §4.1)."""

from tst.data.adapters import cv_bench, load_benchmark, mmmu, video_mme, vsi_bench
from tst.data.schema import MCQ, NUMERIC, OPEN


class TestVSIBench:
    def test_mcq_row(self):
        row = {
            "id": 17,
            "dataset": "scannet",
            "scene_name": "scene0011_00",
            "question_type": "object_rel_distance",
            "question": "Which object is closest to the sofa?",
            "options": ["A. table", "B. lamp", "C. rug", "D. bed"],
            "ground_truth": "B",
        }
        s = vsi_bench.row_to_sample(row, 0)
        assert s.answer_type == MCQ
        assert s.answer == "B"
        assert s.options == ["table", "lamp", "rug", "bed"]
        assert s.category == "object_rel_distance"

    def test_numeric_row(self):
        row = {
            "id": 3,
            "question_type": "room_size_estimation",
            "question": "What is the size of the room in square meters?",
            "options": None,
            "ground_truth": "23.5",
        }
        s = vsi_bench.row_to_sample(row, 0)
        assert s.answer_type == NUMERIC
        assert s.answer_value == 23.5

    def test_gold_as_option_text(self):
        row = {
            "question_type": "object_rel_distance",
            "question": "q?",
            "options": ["table", "lamp"],
            "ground_truth": "lamp",
        }
        assert vsi_bench.row_to_sample(row, 0).answer == "B"

    def test_bad_row_skipped(self):
        assert vsi_bench.row_to_sample({"question": ""}, 0) is None
        samples = vsi_bench.rows_to_samples([{"question": "q", "ground_truth": "abc",
                                              "question_type": "object_counting"}])
        assert samples == []


class TestCVBench:
    def test_row(self):
        row = {
            "idx": 5,
            "type": "3D",
            "task": "Depth",
            "question": "Which object is closer to the camera?",
            "choices": ["the chair", "the plant"],
            "answer": "(B)",
            "source": "ADE20K",
        }
        s = cv_bench.row_to_sample(row, 0)
        assert s.answer == "B"
        assert s.category == "3d_depth"
        assert s.options == ["the chair", "the plant"]

    def test_rows(self):
        rows = [
            {"question": "q1?", "choices": ["a", "b", "c", "d"], "answer": "(D)", "task": "Count", "type": "2D"},
            {"question": "", "choices": ["a"], "answer": "(A)"},  # dropped
        ]
        out = cv_bench.rows_to_samples(rows)
        assert len(out) == 1 and out[0].answer == "D"


class TestMMMU:
    def test_mcq_row_with_string_options(self):
        row = {
            "id": "validation_Art_12",
            "question": "What style is shown in <image 1>?",
            "options": "['Baroque', 'Cubism', 'Impressionism', 'Gothic']",
            "answer": "C",
            "question_type": "multiple-choice",
            "subfield": "Art History",
        }
        s = mmmu.row_to_sample(row, 0)
        assert s.answer_type == MCQ
        assert s.options[2] == "Impressionism"
        assert s.answer == "C"
        assert "<image 1>" in s.question  # placeholder kept, image dropped

    def test_open_row(self):
        row = {
            "id": "validation_Math_3",
            "question": "Compute the area.",
            "options": "[]",
            "answer": "42",
            "question_type": "open",
        }
        s = mmmu.row_to_sample(row, 0)
        assert s.answer_type == OPEN

    def test_mcq_only_filter(self):
        rows = [
            {"id": "a_b_1", "question": "q", "options": "['x','y']", "answer": "A",
             "question_type": "multiple-choice"},
            {"id": "a_b_2", "question": "q", "options": "[]", "answer": "7",
             "question_type": "open"},
        ]
        assert len(mmmu.rows_to_samples(rows, mcq_only=True)) == 1
        assert len(mmmu.rows_to_samples(rows, mcq_only=False)) == 2


class TestVideoMME:
    def test_row_with_subtitles(self):
        row = {
            "question_id": "001-1",
            "video_id": "001",
            "duration": "short",
            "domain": "Knowledge",
            "task_type": "Counting Problem",
            "question": "How many people appear?",
            "options": ["A. one", "B. two", "C. three", "D. four"],
            "answer": "C",
            "subtitle": "[00:01] hello there [00:05] welcome",
        }
        s = video_mme.row_to_sample(row, 0)
        assert s.answer == "C"
        assert s.options == ["one", "two", "three", "four"]
        assert "welcome" in s.context

    def test_subtitles_excluded(self):
        row = {
            "question_id": "x", "question": "q?", "options": ["A. a", "B. b"],
            "answer": "A", "subtitle": "secret",
        }
        s = video_mme.row_to_sample(row, 0, include_subtitles=False)
        assert s.context == ""


class TestLoadBenchmark:
    def test_synthetic_route(self):
        ds = load_benchmark("synthetic:0.5", n=32)
        assert len(ds) == 32
        assert sum(s.meta["planted_bias"] for s in ds) == 16

    def test_synthetic_vsi_route(self):
        """The north-star anchor workload: VSI-shaped ~3:1 MCQ+numeric mix
        with planted bias on both answer types."""
        ds = load_benchmark("synthetic-vsi:0.4", n=200, seed=1)
        assert len(ds) == 200
        types = [s.answer_type for s in ds]
        assert types.count("numeric") == 50 and types.count("mcq") == 150
        biased_num = [s for s in ds if s.answer_type == "numeric"
                      and s.meta.get("planted_bias")]
        assert len(biased_num) == 20
        assert all(s.answer == "10" for s in biased_num)

    def test_adapter_with_inline_rows(self):
        rows = [{"question": "q?", "choices": ["a", "b"], "answer": "(A)",
                 "task": "Count", "type": "2D"}]
        ds = load_benchmark("cv_bench", source=rows)
        assert len(ds) == 1
        assert ds.name == "cv_bench"
