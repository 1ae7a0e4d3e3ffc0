"""MoM observation-XML schedule sink (SURVEY §1.1 D8 sink side).

The reference emits one XML per scheduled pulsar by stem-substituting
a MoM template DOM (``scheduling/bfscheduler.py:26-240`` xmlSched)
and then line-surgery-merges the per-target files into one schedule
XML, optionally wrapped in a MoM folder with a 255-char truncated
description (``bfscheduler.py:753-788``). The real MoM template ships
outside the reference repo ($LOFARSOFT/release/share/pulsar/data/
templates, bfscheduler.py:38-41), so this module packages a MINIMAL
template containing every element the reference updater rewrites;
``render_target_xml`` accepts any real template path unchanged.

Driver-side by design, like the scheduler it serializes (W10,
SURVEY §2.5): the schedule is at most hundreds of rows.
"""

from __future__ import annotations

import math
import re
from xml.dom import minidom

# bfscheduler.py:33 — core-station numbers; real names are CS%03d
CORE_STATIONS = [
    1, 2, 3, 4, 5, 6, 7, 11, 13, 17, 21, 24, 26, 28, 30, 31, 32,
    101, 103, 201, 301, 302, 401, 501,
]

# Minimal MoM template: 5 header lines / 2 trailer lines (the merge
# in render_schedule_xml cuts on exactly those counts, like the
# reference's xmllines[:5] / [-2:] surgery), one observation item and
# one pipeline item carrying every stem xmlSched.update() rewrites.
DEFAULT_TEMPLATE = """<lofar:project xmlns:lofar="http://www.astron.nl/MoM2-Lofar">
<version>2.21.0</version>
<temporaryProjectFactors>1</temporaryProjectFactors>
<projectName>PROJECT_NAME</projectName>
<children>
<item index="OBSINDEX">
<lofar:observation>
<name>OBSINDEX PSRNAME</name>
<description>PSRNAME LENGTHMIN min</description>
<topology>B.OBSINDEX.PSRNAME</topology>
<startTime>STARTTIME</startTime>
<endTime>ENDTIME</endTime>
<duration>LENGTHSEC</duration>
<clusterResources><cluster><name>CLUSTER_NAME</name></cluster></clusterResources>
<stations>STATIONS</stations>
<sap><targetName>PSRNAME</targetName><ra>0</ra><dec>0</dec></sap>
<tiedArrayBeam><angle1>0.0</angle1><angle2>0.0</angle2></tiedArrayBeam>
<lofar:bfDataProduct topology="B.OBSINDEX.PSRNAME.bf"></lofar:bfDataProduct>
</lofar:observation>
</item>
<item index="PIPEINDEX">
<lofar:pipeline>
<name>PSRNAME/PULP</name>
<predecessor_topology>B.OBSINDEX.PSRNAME</predecessor_topology>
<duration>PIPELENGTH</duration>
</lofar:pipeline>
</item>
</children>
</lofar:project>"""


def ra2deg(rastr: str) -> float:
    """HH:MM:SS.SS -> degrees (bfscheduler.py:109-112)."""
    hh, mm, ss = rastr.split(":")
    return 15.0 * (float(hh) + (float(mm) + float(ss) / 60.0) / 60.0)


def dec2deg(decstr: str) -> float:
    """[+/-]DD:MM:SS.SS -> degrees (bfscheduler.py:114-120)."""
    sign = 1.0
    dd, mm, ss = decstr.split(":")
    if dd[0] == "-":
        sign = -1.0
    return sign * (abs(int(dd)) + (float(mm) + float(ss) / 60.0) / 60.0)


def good_stations(bad_stations_str: str) -> list[str] | None:
    """Core-station list minus the excluded numbers
    (bfscheduler.py:58-70): ``"-1"`` -> None (don't touch the
    template's stations), ``""``/``"0"`` -> all core stations,
    otherwise a comma-separated exclusion list."""
    if bad_stations_str == "-1":
        return None
    if bad_stations_str in ("", "0"):
        return [f"CS{cs:03d}" for cs in CORE_STATIONS]
    bads = {int(s) for s in bad_stations_str.split(",")}
    return [f"CS{cs:03d}" for cs in CORE_STATIONS if cs not in bads]


def _walk(node, fn):
    fn(node)
    for child in list(node.childNodes):
        _walk(child, fn)


def _sub_text(node, names: tuple[str, ...], stem: str, value: str):
    if node.nodeName in names and node.childNodes:
        node.childNodes[0].data = re.sub(stem, value, node.childNodes[0].data)


def render_target_xml(
    project: str,
    cluster: str,
    obsindex: int,
    psr: str,
    duration_min: int,
    start: str,
    end: str,
    ra: str,
    dec: str,
    bad_stations: str = "",
    template: str | None = None,
) -> str:
    """One scheduled target's MoM XML: every rewrite of
    ``xmlSched.update()`` (bfscheduler.py:87-240) applied to the
    template DOM — project/cluster names, OBSINDEX / PIPEINDEX
    (pipeline index = 10000 + obsindex), pulsar name in
    name/targetName/description/topology/predecessor/bfDataProduct,
    LENGTHMIN description, start/end times, SAP ra/dec in degrees,
    TAB angle offsets shifted by the pointing in radians, durations
    (LENGTHSEC = min*60; PIPELENGTH = 10x), and the stations list."""
    doc = minidom.parseString(template or DEFAULT_TEMPLATE)
    root = doc.firstChild
    radeg = ra2deg(ra)
    decdeg = dec2deg(dec)
    duration = int(duration_min) * 60
    stations = good_stations(bad_stations)

    def upd(n):
        # project / cluster names (updateProjectName / updateClusterName)
        if n.nodeName in ("name", "projectName") and n.childNodes:
            if n.childNodes[0].data == "PROJECT_NAME":
                n.childNodes[0].data = project
        if n.nodeName == "name" and n.childNodes:
            if n.childNodes[0].data == "CLUSTER_NAME":
                n.childNodes[0].data = cluster
        # pointing / pipeline indices
        if n.nodeName == "item" and n.attributes and "index" in n.attributes.keys():
            if n.attributes["index"].value == "OBSINDEX":
                n.attributes["index"].value = "%d" % obsindex
            elif n.attributes["index"].value == "PIPEINDEX":
                n.attributes["index"].value = "%d" % (10000 + obsindex)
        _sub_text(n, ("name", "topology"), "OBSINDEX", "%d" % obsindex)
        if n.nodeName == "predecessor_topology" and n.childNodes:
            _sub_text(n, ("predecessor_topology",), "OBSINDEX", "%d" % obsindex)
        if (
            n.nodeName == "lofar:bfDataProduct"
            and n.attributes
            and "topology" in n.attributes.keys()
        ):
            n.attributes["topology"].value = re.sub(
                "OBSINDEX", "%d" % obsindex, n.attributes["topology"].value
            )
            n.attributes["topology"].value = re.sub(
                "PSRNAME", psr, n.attributes["topology"].value
            )
        # pulsar name (updatePointingName)
        _sub_text(
            n, ("name", "targetName", "description", "topology"),
            "PSRNAME", psr,
        )
        if n.nodeName == "predecessor_topology" and n.childNodes:
            _sub_text(n, ("predecessor_topology",), "PSRNAME", psr)
        # description length (updateDescription)
        _sub_text(n, ("description",), "LENGTHMIN", str(duration_min))
        # start / end (updateStartEndTime)
        if n.nodeName == "startTime" and n.childNodes:
            n.childNodes[0].data = start
        if n.nodeName == "endTime" and n.childNodes:
            n.childNodes[0].data = end
        # SAP coordinates in degrees (updateSAPcoordinates)
        if n.nodeName == "ra" and n.childNodes:
            n.childNodes[0].data = radeg
        if n.nodeName == "dec" and n.childNodes:
            n.childNodes[0].data = decdeg
        # TAB offsets shifted by the pointing in RADIANS
        # (updateTABcoordinates: template values are offsets)
        if n.nodeName == "angle1" and n.childNodes:
            n.childNodes[0].data = str(
                float(n.childNodes[0].data) + radeg / 180.0 * math.pi
            )
        if n.nodeName == "angle2" and n.childNodes:
            n.childNodes[0].data = str(
                float(n.childNodes[0].data) + decdeg / 180.0 * math.pi
            )
        # durations (updateObsDuration / updatePipelineDuration)
        _sub_text(n, ("duration",), "LENGTHSEC", "%d" % duration)
        _sub_text(n, ("duration",), "PIPELENGTH", "%d" % (10 * duration))
        # stations (updateStationsList)
        if stations is not None and n.nodeName == "stations" and n.childNodes:
            if n.childNodes[0].data == "STATIONS":
                n.childNodes[0].data = ",".join(stations)

    _walk(root, upd)
    return doc.toxml(encoding="UTF-8").decode("utf-8")


def render_schedule_xml(
    targets: list[dict],
    project: str,
    cluster: str,
    folder: str = "",
    template: str | None = None,
) -> str:
    """The merged single schedule XML (bfscheduler.py:753-788): each
    target's XML is rendered, then line-surgery-merged — the first
    file keeps its 5 header lines, the last its 2 trailer lines,
    every other contributes only its body. With ``folder`` set, the
    items are wrapped in a ``lofar:folder`` whose description is the
    comma-joined pulsar list truncated to MoM's 255-char limit with
    the reference's exact drop-last-truncated + ",..." rule.

    Each target dict needs: name, obsindex, duration_min, start, end,
    ra, dec, and optionally bad_stations."""
    rendered = [
        render_target_xml(
            project,
            cluster,
            t["obsindex"],
            t["name"],
            t["duration_min"],
            t["start"],
            t["end"],
            t["ra"],
            t["dec"],
            t.get("bad_stations", ""),
            template=template,
        ).splitlines()
        for t in targets
    ]
    if not rendered:
        return ""
    out_parts: list[str] = []
    n = len(rendered)
    for ii, xmllines in enumerate(rendered):
        if ii == 0:
            if folder == "":
                if n == 1:
                    outline = "\n".join(xmllines)
                else:
                    outline = "\n".join(xmllines[:-2])
            else:
                outline = "\n".join(xmllines[:5])
                descr = ", ".join(t["name"] for t in targets)
                if len(descr) > 255:
                    descr = (
                        ", ".join(descr[:251].split(", ")[:-1]) + ",..."
                    )
                outline += (
                    '\n\t<item index="0">\n\t<lofar:folder '
                    'topology_parent="true">\n\t\t<topology>0</topology>'
                    "\n\t\t<name>%s</name>\n\t\t<description>%s"
                    "</description>\n\t\t<children>\n" % (folder, descr)
                )
                outline += "\n".join(xmllines[5:-2])
                if n == 1:
                    outline += "\n</children>\n</lofar:folder>\n</item>\n"
                    outline += "\n".join(xmllines[-2:])
        elif ii == n - 1:
            if folder == "":
                outline = "\n".join(xmllines[5:])
            else:
                outline = "\n".join(xmllines[5:-2])
                outline += "\n</children>\n</lofar:folder>\n</item>\n"
                outline += "\n".join(xmllines[-2:])
        else:
            outline = "\n".join(xmllines[5:-2])
        out_parts.append(outline + "\n")
    return "".join(out_parts)


def write_schedule_xml(path: str, *args, **kwargs) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(render_schedule_xml(*args, **kwargs))
