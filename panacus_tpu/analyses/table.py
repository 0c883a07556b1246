"""Full coverage table export (reference: src/analyses/table.rs:10-78)."""

from __future__ import annotations

from typing import List, Set

from ..io_utils import write_metadata_comments
from ..report.sections import AnalysisSection
from . import Analysis


class Table(Analysis):
    def get_type(self) -> str:
        return "Table"

    def get_graph_requirements(self) -> Set:
        from ..broker import Req

        req = {
            Req.abacus_by_group(self.parameter.count_type),
            # table export reads per-path multiplicities (sparse_counts);
            # multi-host must retain/merge item runs for it
            Req.group_table(self.parameter.count_type),
        }
        req |= self.count_to_input_req(self.parameter.count_type)
        return req

    def generate_table(self, gb) -> str:
        if gb is None:
            raise ValueError("Table table generation should get Graph")
        ab = gb.get_abacus_by_group()
        res = write_metadata_comments()
        res += ab.to_tsv(self.parameter.total, gb.graph_aux)
        return res

    def generate_report_section(self, gb) -> List[AnalysisSection]:
        return []
