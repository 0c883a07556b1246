"""Task pipeline: AnalysisRun -> Tasks -> execution against one GraphBroker.

(reference: src/analysis_parameter.rs:117-151, src/lib.rs:235-311)
"""

from __future__ import annotations

import json as json_mod
import logging
from dataclasses import dataclass
from typing import IO, List, Optional, Set, Union

from .analyses import Analysis, construct_analysis
from .broker import GraphBroker, GraphState, Req
from .config import AnalysisParameter, AnalysisRun, Grouping
from .report.sections import AnalysisSection

log = logging.getLogger("panacus")


@dataclass
class GraphStateChange:
    graph: str
    name: Optional[str]
    reqs: Set
    nice: bool
    subset: str
    exclude: str
    grouping: Optional[Grouping]

    def __repr__(self) -> str:
        return (
            f'GraphStateChange("{self.graph}", {self.name!r}, "{self.subset}", '
            f'"{self.exclude}", {self.grouping}, {sorted(map(str, self.reqs))}, '
            f"{self.nice})"
        )


@dataclass
class OrderChange:
    order: Optional[str]

    def __repr__(self) -> str:
        return f"OrderChange({self.order!r})"


@dataclass
class AnalysisTask:
    analysis: Analysis

    def __repr__(self) -> str:
        return f"Analysis {self.analysis.get_type()}"


@dataclass
class CustomSectionTask:
    name: str
    file: str

    def __repr__(self) -> str:
        return f'CustomSection("{self.name}", "{self.file}")'


Task = Union[GraphStateChange, OrderChange, AnalysisTask, CustomSectionTask]


def analysis_to_tasks(p: AnalysisParameter):
    """(reference: analysis_parameter.rs:224-258)"""
    if p.kind == "custom":
        return [CustomSectionTask(p.name, p.file)], set()
    a = construct_analysis(p)
    reqs = a.get_graph_requirements()
    tasks: List[Task] = []
    if p.kind == "ordered_growth":
        tasks.append(OrderChange(p.order))
    tasks.append(AnalysisTask(a))
    return tasks, reqs


def convert_to_tasks(runs: List[AnalysisRun]) -> List[Task]:
    runs = sorted(runs, key=lambda r: r.sort_key())
    tasks: List[Task] = []
    for run in runs:
        analyses = sorted(run.analyses, key=lambda a: a.sort_key())
        run_tasks: List[Task] = []
        reqs: Set = set()
        for a in analyses:
            t, r = analysis_to_tasks(a)
            run_tasks.extend(t)
            reqs |= r
        reqs.add(Req.graph(run.graph))
        tasks.append(
            GraphStateChange(
                graph=run.graph,
                name=run.name,
                reqs=reqs,
                nice=run.nice,
                subset=run.subset,
                exclude=run.exclude,
                grouping=run.grouping,
            )
        )
        tasks.extend(run_tasks)
    return tasks


def execute_pipeline(
    tasks: List[Task],
    out: IO[str],
    shall_write_html: bool = False,
    json: bool = False,
) -> None:
    """(reference: src/lib.rs:235-311)"""
    if not tasks:
        log.warning("No instructions supplied")
        return
    report: List[AnalysisSection] = []
    gb = GraphBroker()
    for task in tasks:
        if isinstance(task, AnalysisTask):
            log.info("Executing Analysis: %s", task.analysis.get_type())
            if json or shall_write_html:
                report.extend(task.analysis.generate_report_section(gb))
        elif isinstance(task, CustomSectionTask):
            from .report.custom import generate_custom_section

            report.extend(generate_custom_section(gb, task.name, task.file))
        elif isinstance(task, GraphStateChange):
            log.info("Executing graph change: %s", task.reqs)
            gb.change_graph_state(
                GraphState(
                    graph=task.graph,
                    name=task.name,
                    subset=task.subset,
                    exclude=task.exclude,
                    grouping=task.grouping,
                ),
                task.reqs,
                task.nice,
            )
        elif isinstance(task, OrderChange):
            log.info("Executing order change: %s", task.order)
            gb.change_order(task.order if task.order is not None else "")
    if json:
        out.write(
            json_mod.dumps([s.to_json_dict() for s in report], indent=2)
        )
        out.write("\n")
    elif shall_write_html:
        from .report.html import generate_report

        out.write(generate_report(report, "<Placeholder Filename>"))
        out.write("\n")
    else:
        last_analysis = None
        for task in tasks:
            if isinstance(task, AnalysisTask):
                last_analysis = task.analysis
        if isinstance(tasks[-1], AnalysisTask) and last_analysis is not None:
            out.write(last_analysis.generate_table(gb))
            out.write("\n")
