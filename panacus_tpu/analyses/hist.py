"""Coverage histogram analysis (reference: src/analyses/hist.rs:15-135)."""

from __future__ import annotations

from typing import List, Optional, Set

from ..io_utils import write_metadata_comments, write_table
from ..report.sections import AnalysisSection, bar
from ..utils import CountType
from . import Analysis


class HistAnalysis(Analysis):
    def get_type(self) -> str:
        return "Hist"

    def generate_table(self, gb) -> str:
        if gb is None:
            raise ValueError("Hist analysis needs a graph")
        res = write_metadata_comments()
        header_cols = [["panacus", "count", "", ""]]
        output_columns = []
        for h in gb.get_hists().values():
            output_columns.append([float(x) for x in h.coverage])
            header_cols.append(["hist", str(h.count), "", ""])
        res += write_table(header_cols, output_columns)
        return res

    def generate_report_section(self, gb) -> List[AnalysisSection]:
        if gb is None:
            raise ValueError("Hist analysis needs a graph")
        table = f"`{self.generate_table(gb)}`"
        id_prefix = "cov-hist-" + _safe(self._run_id(gb))
        out = []
        for k, v in gb.get_hists().items():
            out.append(
                AnalysisSection(
                    id=f"{id_prefix}-{k}",
                    analysis="Coverage Histogram",
                    table=table,
                    run_name=gb.get_run_name(),
                    run_id=self._run_id(gb),
                    countable=str(k),
                    items=[
                        bar(
                            id=f"{id_prefix}-{k}",
                            name=gb.get_fname(),
                            x_label="taxa",
                            y_label=f"#{k}s",
                            labels=[str(i) for i in range(len(v.coverage))],
                            values=[float(c) for c in v.coverage],
                            log_toggle=True,
                        )
                    ],
                )
            )
        return out

    def get_graph_requirements(self) -> Set:
        from ..broker import Req

        req = {Req.HIST}
        req |= self.count_to_input_req(self.parameter.count_type)
        return req

    def _run_id(self, gb) -> str:
        return f"{gb.get_run_id()}-hist"


def _safe(s: str) -> str:
    return s.lower().replace(" ", "-").replace("|", "-").replace("\\", "-")
