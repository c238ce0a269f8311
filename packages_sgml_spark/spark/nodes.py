"""Node-table query layer: the DataFrame analog of the reference's
xpath library (/root/reference/xpath.pl) over the flattened DOM
produced by extract().

Flattened rows: (url, node_id, parent_id, ord, kind, name, attrs,
text).  All operators are pure DataFrame ops (no UDFs): descendant
axes via self-joins on parent chains are avoided by precomputing the
ancestor path only when needed; the common axes below need only
groupBy/window/filter, which Catalyst pushes down and AQE sizes.
"""

from pyspark.sql import DataFrame, Window, functions as F


def explode_nodes(extracted: DataFrame) -> DataFrame:
    """extract() output -> one row per DOM node."""
    return (extracted
            .select("url", F.explode("nodes").alias("n"))
            .select("url", "n.node_id", "n.parent_id", "n.ord", "n.kind",
                    "n.name", "n.attrs", "n.text", "n.subtree_end",
                    "n.start_pos", "n.end_pos"))


def elements_named(nodes: DataFrame, name) -> DataFrame:
    """//name (descendant-or-self axis over the whole doc ==
    filter on the flattened table; xpath.pl:269-298 `//` semantics)."""
    return nodes.filter((F.col("kind") == "element") &
                        (F.col("name") == name))


def attr(nodes: DataFrame, name, attr_name, alias=None) -> DataFrame:
    """//name/@attr (xpath.pl:462-509)."""
    return (elements_named(nodes, name)
            .select("url", "node_id",
                    F.element_at("attrs", attr_name)
                    .alias(alias or attr_name)))


def child_text(nodes: DataFrame) -> DataFrame:
    """Direct-child text per element: element rows joined to their
    text children, concatenated in document order
    (xpath.pl text-of-node for flat elements)."""
    texts = (nodes.filter(F.col("kind").isin("text", "sdata", "ndata"))
             .select("url", F.col("parent_id").alias("node_id"),
                     "ord", "text"))
    agg = (texts.groupBy("url", "node_id")
           .agg(F.concat_ws(
               "", F.transform(
                   F.array_sort(F.collect_list(F.struct("ord", "text"))),
                   lambda s: s["text"])).alias("text_direct")))
    return agg


def page_meta(nodes: DataFrame) -> DataFrame:
    """HTML head metadata per document — the fields every crawl
    pipeline reads (title, meta description, og:title, canonical
    link, html@lang) — from flattened node rows in one pass.

    Shape: the four attr fields are ONE conditional aggregation over
    element rows (url-partitioned hash agg); the title text is the
    one structural lookup (text children of the first <title>),
    joined url-wise.  Docs that parsed to zero nodes contribute no
    row (same contract as extract()).  Absent fields are NULL."""
    el = nodes.filter(F.col("kind") == "element")
    a = F.col("attrs")
    name = F.col("name")

    def low(field):
        return F.lower(F.coalesce(F.element_at(a, field), F.lit("")))

    def pick(cond, field):
        return F.min(F.when(cond, F.element_at(a, field)))

    metas = el.groupBy("url").agg(
        pick((name == "meta") & (low("name") == "description"),
             "content").alias("meta_description"),
        pick((name == "meta") & (low("property") == "og:title"),
             "content").alias("og_title"),
        pick((name == "link") & (low("rel") == "canonical"),
             "href").alias("canonical"),
        pick(name == "html", "lang").alias("html_lang"))
    # renamed join keys: titles and texts share nodes' lineage, and
    # unrenamed url would be an ambiguous self-join reference
    titles = el.filter(name == "title").select(
        F.col("url").alias("t_url"),
        F.col("node_id").alias("title_id"))
    texts = (nodes.filter(F.col("kind").isin("text", "sdata", "ndata"))
             .select("url", "parent_id", "ord", "text"))
    ttext = (texts.join(titles,
                        (texts["url"] == titles["t_url"]) &
                        (texts["parent_id"] == titles["title_id"]))
             .select("url", "title_id", "ord", "text"))
    per_title = (ttext.groupBy("url", "title_id")
                 .agg(F.concat_ws("", F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("ord", "text"))),
                     lambda s: s["text"])).alias("t")))
    first_title = (per_title.groupBy("url")
                   .agg(F.min(F.struct("title_id", "t"))["t"]
                        .alias("title")))
    return (metas.join(first_title, "url", "left")
            .select("url", "title", "meta_description", "og_title",
                    "canonical", "html_lang"))


def named_subtree_text(nodes: DataFrame, name) -> DataFrame:
    """Text of all descendants of each //name element
    (xpath.pl:584-620 `text`).

    node_id is pre-order and subtree_end marks one-past-the-last
    descendant, so "descendant" is a range predicate: a single
    url-partitioned join (no recursion, no iteration).  AQE sizes
    the shuffle; per-url fan-out is bounded by document size."""
    roots = (elements_named(nodes, name)
             .select("url", F.col("node_id").alias("root_id"),
                     F.col("subtree_end").alias("root_end")))
    texts = (nodes.filter(F.col("kind").isin("text", "sdata", "ndata"))
             .select("url", "node_id", "text"))
    joined = roots.join(texts, "url") \
        .filter((F.col("node_id") > F.col("root_id")) &
                (F.col("node_id") < F.col("root_end")))
    return (joined.groupBy("url", "root_id")
            .agg(F.concat_ws(
                "", F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("node_id", "text"))),
                    lambda s: s["text"])).alias("text_subtree")))


def sibling_index(nodes: DataFrame) -> DataFrame:
    """position()/last() analog (xpath.pl:352-439): per-name sibling
    rank and count among same-name siblings."""
    w = Window.partitionBy("url", "parent_id", "name").orderBy("ord")
    wc = Window.partitionBy("url", "parent_id", "name")
    return (nodes.filter(F.col("kind") == "element")
            .withColumn("sib_index", F.row_number().over(w))
            .withColumn("sib_count", F.count("*").over(wc)))


def count_named(nodes: DataFrame) -> DataFrame:
    """count_named_elements analog (xpath.pl:352-371)."""
    return (nodes.filter(F.col("kind") == "element")
            .groupBy("url", "name")
            .agg(F.count("*").alias("n")))
