"""Unit guards for the xplane trace reader and the analytic FLOPs model.

The xplane reader's proto transcription (tst/aux/xplane.proto) must keep
matching the deployed profiler's wire format — pin it by round-tripping a
hand-built XSpace. The FLOPs model's per-remat-mode hardware accounting
must keep matching what each policy actually recomputes (the docs and MFU
figures are derived from it).
"""

import numpy as np
import pytest

from tst.aux.xplane import _xplane_pb2, category_summary, device_op_summary
from tst.aux.flops import train_step_flops
from tst.models.decoder import spec_by_name
from tst.models.lora import LoraSpec


class TestXplaneReader:
    def _build_space(self, tmp_path):
        pb2 = _xplane_pb2()
        space = pb2.XSpace()
        plane = space.planes.add()
        plane.name = "/device:TPU:0"
        plane.event_metadata[1].id = 1
        plane.event_metadata[1].name = "fusion.1"
        plane.event_metadata[2].id = 2
        plane.event_metadata[2].name = "my_matmul"
        plane.stat_metadata[7].id = 7
        plane.stat_metadata[7].name = "hlo_category"
        line = plane.lines.add()
        line.name = "XLA Ops"
        for mid, dur_ps in ((1, 3_000_000), (1, 1_000_000), (2, 8_000_000)):
            ev = line.events.add()
            ev.metadata_id = mid
            ev.duration_ps = dur_ps
            if mid == 2:
                st = ev.stats.add()
                st.metadata_id = 7
                st.str_value = "convolution"
        p = tmp_path / "x.xplane.pb"
        p.write_bytes(space.SerializeToString())
        return str(p)

    def test_device_op_summary_math(self, tmp_path):
        ops = device_op_summary(self._build_space(tmp_path))
        by_name = {r["name"]: r for r in ops}
        assert by_name["my_matmul"]["total_us"] == 8.0
        assert by_name["my_matmul"]["category"] == "convolution"
        assert by_name["fusion.1"]["total_us"] == 4.0
        assert by_name["fusion.1"]["occurrences"] == 2
        assert abs(by_name["my_matmul"]["frac"] - 8 / 12) < 1e-3  # frac is rounded to 4dp
        cats = {c["category"]: c for c in category_summary(ops)}
        assert cats["convolution"]["total_us"] == 8.0
        assert cats["uncategorized"]["total_us"] == 4.0

    def test_non_device_planes_ignored(self, tmp_path):
        pb2 = _xplane_pb2()
        space = pb2.XSpace()
        plane = space.planes.add()
        plane.name = "/host:CPU"
        line = plane.lines.add()
        line.name = "XLA Ops"
        ev = line.events.add()
        ev.metadata_id = 1
        ev.duration_ps = 1000
        p = tmp_path / "h.xplane.pb"
        p.write_bytes(space.SerializeToString())
        assert device_op_summary(str(p)) == []


class TestFlopsModel:
    SPEC = spec_by_name("qwen2.5-0.5b")
    LSPEC = LoraSpec(rank=16)
    KW = dict(n_rows=20, seq=512, t_max=4)

    def _hw(self, remat):
        return train_step_flops(self.SPEC, self.LSPEC, remat=remat,
                                **self.KW)["hardware_flops"]

    def test_model_flops_remat_invariant(self):
        vals = {train_step_flops(self.SPEC, self.LSPEC, remat=r,
                                 **self.KW)["model_flops"]
                for r in (False, True, "dots", "dots_attn", "dots_flash",
                          "light", "attn")}
        assert len(vals) == 1  # MFU convention: never counts recompute

    def test_hardware_ordering_matches_policies(self):
        no, full = self._hw(False), self._hw(True)
        dots, dots_attn = self._hw("dots"), self._hw("dots_attn")
        dots_flash, light, attn = (self._hw("dots_flash"), self._hw("light"),
                                   self._hw("attn"))
        # no recompute: False == dots_flash == model flops
        assert no == dots_flash
        # dots and dots_attn both re-run the flash forward (only)
        assert dots == dots_attn > no
        # light re-runs gate/up matmuls — more than the flash fwd at S=512
        assert light > dots
        # attn re-runs o-proj + whole MLP: more than light (gate/up only)
        assert attn > light
        # full remat re-runs everything — strictly the most
        assert full > attn
