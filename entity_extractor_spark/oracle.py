"""Pure-Python oracle: literal sequential replay of the reference's
ingest control flow (artifact_ingestor_service.py), used as ground truth for
the Spark pipeline's triple P/R gate (SURVEY.md §5.2, BASELINE.md §b).

Mirrors, in order, per document (sorted by doc_id = reference queue order):
  parse -> display-name compose (:725-742) -> last-wins chemical dedupe
  (:788-791) -> validation (:793-803) -> identity probe J7 (:979-989,
  raises => whole doc skipped) -> manufacturer exact-name link (:991-1008)
  -> material insert (:1010-1025) -> per chemical: CAS-first/name-second
  linking cascade (:1027-1084), source-lattice merge (:1237-1257),
  unconditional cas overwrite (:1083), edge upsert (:1086-1106) ->
  material re-resolution (:1108-1145, :1259-1282) -> evidencedBy mapping
  (:534-545). Any exception rolls the whole doc back (:609-612).

Also replays the keyword-analysis mention scan
(file_analysis_service.py:68-121) for the mentions oracle.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .functions.lattice import (
    NONE,
    PENDING,
    TransitionError,
    fold_observation,
    resolve_material,
    status_from_tag,
)

HEADER_RE = re.compile(
    r"^(.*?)(?: \(P/N ([^)]*)\))?(?: \(UPC ([^)]*)\))? manufactured by ([^,]*), ([^,]*), ([^,]*)$"
)
COMP_RE = re.compile(
    r"^(.*?) CAS ([0-9\-]+|-) ([0-9.]+)% (PFAS|NO_PFAS|PENDING) src=([A-Z]+)$"
)


def norm_name(s: str) -> str:
    # F1 — global_node_repository.py:29
    return s.lower().replace(" ", "")


def compose_display_name(name: str, prod: str | None, upc: str | None) -> str:
    # F5 — artifact_ingestor_service.py:725-742
    out = name
    if prod and prod.strip():
        out += f" ({prod})"
    if upc and upc.strip():
        out += f" ({upc})"
    return out


def cas_or_none(cas: str | None) -> str | None:
    # F6 — :1035-1039; '-' is the corpus' missing marker
    if cas is None:
        return None
    c = cas.strip()
    return None if c in ("", "-") else c


@dataclass
class Node:
    id: str
    name: str
    node_type: str
    cas_number: str | None
    manufacturer_id: str
    pfas_status: str
    pfas_information_source: str


@dataclass
class OracleState:
    manufacturers: dict[str, dict] = field(default_factory=dict)  # exact name -> row
    nodes: list[Node] = field(default_factory=list)
    edges: dict[tuple[str, str], str] = field(default_factory=dict)  # (mat_id, chem_id) -> weight
    evidenced: list[tuple[str, str]] = field(default_factory=list)  # (mat_id, doc_id)
    skipped_docs: list[tuple[str, str]] = field(default_factory=list)  # (doc_id, reason)
    _next: int = 0

    def new_id(self, prefix: str) -> str:
        self._next += 1
        return f"{prefix}:{self._next:06d}"


def parse_doc(doc: dict) -> dict | None:
    """Extract the MSDSAnalysis-equivalent from a document's text spans.
    First header span wins; every composition-matching span is a chemical
    observation in offset order."""
    header = None
    chems = []
    for s in sorted(doc["spans"], key=lambda s: s["offset"]):
        if s["kind"] != "text":
            continue
        if header is None:
            m = HEADER_RE.match(s["text"])
            if m and " manufactured by " in s["text"]:
                header = m
                continue
        c = COMP_RE.match(s["text"])
        if c:
            chems.append(
                {
                    "chemical_name": c.group(1),
                    "cas_no": c.group(2),
                    "composition": c.group(3),
                    "tag": c.group(4),
                    "pfas_information_source": c.group(5),
                    "seq": s["offset"],
                }
            )
    if header is None:
        return None
    return {
        "material_name": header.group(1),
        "product_number": header.group(2),
        "upc_number": header.group(3),
        "manufacturer_name": header.group(4),
        "manufacturer_city": header.group(5),
        "manufacturer_country": header.group(6),
        "chemicals": chems,
    }


def ingest_corpus(docs: list[dict], state: OracleState | None = None) -> OracleState:
    state = state or OracleState()
    for doc in sorted(docs, key=lambda d: d["doc_id"]):
        _ingest_doc(doc, state)
    return state


def _ingest_doc(doc: dict, state: OracleState) -> None:
    parsed = parse_doc(doc)
    if parsed is None:
        state.skipped_docs.append((doc["doc_id"], "NO_MATERIAL"))
        return
    # F5 compose
    display = compose_display_name(
        parsed["material_name"], parsed["product_number"], parsed["upc_number"]
    )
    # A5 last-wins dedupe by chemical_name (dict insertion keeps last value)
    distinct: dict[str, dict] = {}
    for ch in parsed["chemicals"]:
        distinct[ch["chemical_name"]] = ch
    chems = list(distinct.values())
    if not display:
        state.skipped_docs.append((doc["doc_id"], "NO_MATERIAL"))
        return
    if not chems:
        state.skipped_docs.append((doc["doc_id"], "NO_CHEMICALS"))
        return

    # J7 identity probe: norm(display) + exact manufacturer name
    nkey = norm_name(display)
    for n in state.nodes:
        if (
            n.node_type == "MATERIAL"
            and norm_name(n.name) == nkey
            and n.name.strip() != ""
            and state.manufacturers.get(parsed["manufacturer_name"], {}).get("id")
            == n.manufacturer_id
        ):
            state.skipped_docs.append((doc["doc_id"], "MATERIAL_ALREADY_INGESTED"))
            return

    # transactional delta (session.commit at the end; rollback on error)
    delta_nodes: list[Node] = []
    delta_manu: dict[str, dict] = {}
    delta_edges: dict[tuple[str, str], str] = {}
    touched: list[tuple[Node, tuple[str, str | None, str, str]]] = []  # (node, before)

    def all_nodes():
        return state.nodes + delta_nodes

    try:
        # J6 manufacturer exact-name link
        manu = state.manufacturers.get(parsed["manufacturer_name"])
        if manu is None:
            manu = {
                "id": state.new_id("manu"),
                "name": parsed["manufacturer_name"],
                "city": parsed["manufacturer_city"],
                "country": parsed["manufacturer_country"],
            }
            delta_manu[manu["name"]] = manu

        material = Node(
            id=state.new_id("mat"),
            name=display,
            node_type="MATERIAL",
            cas_number=None,
            manufacturer_id=manu["id"],
            pfas_status=PENDING,
            pfas_information_source=NONE,
        )
        delta_nodes.append(material)

        for ch in chems:
            cas = cas_or_none(ch["cas_no"])
            chem_node = None
            # J5 cascade: CAS+manufacturer first …
            if cas:
                for n in all_nodes():
                    if (
                        n.node_type == "CHEMICAL"
                        and n.cas_number == cas
                        and n.manufacturer_id == manu["id"]
                    ):
                        chem_node = n
                        break
            # … exact name+manufacturer second …
            if chem_node is None:
                for n in all_nodes():
                    if (
                        n.node_type == "CHEMICAL"
                        and n.name == ch["chemical_name"]
                        and n.manufacturer_id == manu["id"]
                    ):
                        chem_node = n
                        break
            src = ch["pfas_information_source"]
            if chem_node is None:
                # … else create
                chem_node = Node(
                    id=state.new_id("chem"),
                    name=ch["chemical_name"],
                    node_type="CHEMICAL",
                    cas_number=cas,
                    manufacturer_id=manu["id"],
                    pfas_status=status_from_tag(ch["tag"]),
                    pfas_information_source=src,
                )
                delta_nodes.append(chem_node)
            else:
                before = (
                    chem_node.pfas_status,
                    chem_node.cas_number,
                    chem_node.pfas_information_source,
                    chem_node.name,
                )
                touched.append((chem_node, before))
                st, so = fold_observation(
                    (chem_node.pfas_status, chem_node.pfas_information_source),
                    ch["tag"],
                    src,
                )  # may raise TransitionError -> doc rollback
                chem_node.pfas_status = st
                chem_node.pfas_information_source = so
                chem_node.cas_number = cas  # unconditional overwrite, :1083
            # J8 edge upsert (weight last-wins)
            key = (material.id, chem_node.id)
            if key in state.edges or key in delta_edges:
                delta_edges[key] = ch["composition"]
            else:
                delta_edges[key] = ch["composition"]

        # commit
        state.manufacturers.update(delta_manu)
        state.nodes.extend(delta_nodes)
        state.edges.update(delta_edges)
        state.evidenced.append((material.id, doc["doc_id"]))
    except TransitionError:
        for node, before in touched:  # rollback in-place mutations
            node.pfas_status, node.cas_number, node.pfas_information_source, node.name = before
        state.skipped_docs.append((doc["doc_id"], "TRANSITION_ERROR"))


def finalize(state: OracleState) -> dict:
    """Re-resolve every material from its chemicals' final states (the
    reference re-resolves after each chemical save, :1108-1145; the final
    fixpoint equals one fold over final chemical states) and emit the
    comparable triple set + node table."""
    by_id = {n.id: n for n in state.nodes}
    mat_children: dict[str, list[tuple[str, str]]] = {}
    for (mat_id, chem_id), _w in state.edges.items():
        mat_children.setdefault(mat_id, []).append(
            (by_id[chem_id].pfas_status, by_id[chem_id].pfas_information_source)
        )
    for n in state.nodes:
        if n.node_type == "MATERIAL" and n.id in mat_children:
            st, so = resolve_material(mat_children[n.id])
            n.pfas_status = st
            n.pfas_information_source = so

    manu_by_id = {m["id"]: m for m in state.manufacturers.values()}
    triples = set()
    for (mat_id, chem_id), w in state.edges.items():
        triples.add((by_id[mat_id].name, "hasChemical", by_id[chem_id].name, w))
    for n in state.nodes:
        if n.node_type == "MATERIAL":
            triples.add((n.name, "manufacturedBy", manu_by_id[n.manufacturer_id]["name"], None))
    for mat_id, doc_id in state.evidenced:
        triples.add((by_id[mat_id].name, "evidencedBy", doc_id, None))

    nodes = [
        (
            n.name,
            n.node_type,
            n.cas_number,
            manu_by_id[n.manufacturer_id]["name"],
            n.pfas_status,
            n.pfas_information_source,
        )
        for n in state.nodes
    ]
    return {"triples": triples, "nodes": nodes, "state": state}


# ---- mention oracle (file_analysis_service.py:68-121) ----------------------

def scan_mentions(docs: list[dict], keywords: list[dict]) -> set[tuple]:
    """Word-boundary-OR-substring keyword scan over whitespace-tokenized
    text spans. Pattern quirk reproduced: the regex is built from the raw
    keyword then the PATTERN string is lowercased before searching the
    lowercased word (file_analysis_service.py:84-87)."""
    out = set()
    for doc in docs:
        for s in doc["spans"]:
            if s["kind"] != "text":
                continue
            words = s["text"].split()
            for kw in keywords:
                k = kw["keyword"]
                pat = re.escape(k).lower()
                for w in words:
                    if re.search(rf"\b{pat}\b", w.lower()) or k.lower() in w.lower():
                        out.add((doc["doc_id"], s["offset"], k, w, 100.0, kw["mtype"]))
    return out


# ---- review replay (save_msds else-branch, :559-607) ------------------------

def replay_reviews(
    nodes: dict[str, dict],
    edges: list[tuple[str, str]],
    reviews: list[dict],
) -> dict[str, dict]:
    """Literal sequential replay of the reference review loop, mutating and
    returning `nodes`.

    nodes: id -> {name, node_type, pfas_status, pfas_information_source}
    edges: hasChemical (material_id, chem_id) pairs, hierarchy order
    reviews: [{review_seq, material_id,
               chemicals: [{chemical_name, tag, source}, ...]}],
             processed in review_seq order (queue order)

    Per review (artifact_ingestor_service.py:559-607): each hierarchy child
    merges its first name-matching review chemical through the F12 lattice
    (an invalid transition DROPS that observation — the batch fold policy;
    the reference aborts the request, :1244-1249); after EVERY child all
    materials containing it re-resolve from current children states; the
    reviewed material is finally overwritten with the resolve over the
    review's own chemical list (:901-913).
    """
    children: dict[str, list[str]] = {}
    mats_of: dict[str, list[str]] = {}
    for m, c in edges:
        children.setdefault(m, []).append(c)
        mats_of.setdefault(c, []).append(m)

    def _resolve_from_children(mid: str) -> None:
        st, so = resolve_material(
            [
                (nodes[c]["pfas_status"], nodes[c]["pfas_information_source"])
                for c in children.get(mid, [])
            ]
        )
        nodes[mid]["pfas_status"] = st
        nodes[mid]["pfas_information_source"] = so

    for r in sorted(reviews, key=lambda r: r["review_seq"]):
        mid = r["material_id"]
        if mid not in nodes or nodes[mid]["node_type"] != "MATERIAL":
            continue  # find_by_id miss => review skipped (:562-566)
        for c in children.get(mid, []):
            match = next(
                (
                    rc
                    for rc in r["chemicals"]
                    if rc["chemical_name"].lower() == nodes[c]["name"].lower()
                ),
                None,
            )
            if match is not None:
                try:
                    st, so = fold_observation(
                        (nodes[c]["pfas_status"], nodes[c]["pfas_information_source"]),
                        match["tag"],
                        match["source"],
                    )
                    nodes[c]["pfas_status"] = st
                    nodes[c]["pfas_information_source"] = so
                except TransitionError:
                    pass  # drop the observation, keep the node state
            for m2 in mats_of.get(c, []):
                _resolve_from_children(m2)
        st, so = resolve_material(
            [(status_from_tag(rc["tag"]), rc["source"]) for rc in r["chemicals"]]
        )
        nodes[mid]["pfas_status"] = st
        nodes[mid]["pfas_information_source"] = so
    return nodes
