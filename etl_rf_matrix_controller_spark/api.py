"""MatrixEngine: the cohesive user-facing API.

One object wrapping the flows a reference user drives through the GUI
(etl_controller.py's MatrixWidget + toolbar), re-expressed over
DataFrames: live state, preset snapshot/restore, group islands, telemetry
health, denormalized export, scatter-gather merge, and the
training-data-pipeline extensions.  Every method returns a DataFrame
(lazy; compose freely) except the explicit sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_rf_matrix_controller_spark.plans.registry import QUERIES, load_all


class MatrixEngine:
    """Facade over the declared operators, bound to a session + data dir.

    >>> eng = MatrixEngine(spark, "/root/testdata/sf0.001")
    >>> eng.latest_state().show()
    >>> eng.apply_preset().filter("from_preset").count()
    """

    def __init__(self, spark: SparkSession, sf_dir: str) -> None:
        load_all()
        self.spark = spark
        self.sf_dir = sf_dir

    def _q(self, name: str) -> DataFrame:
        return QUERIES[name](self.spark, self.sf_dir)

    # -- routing state (SS3.1/SS3.2) --------------------------------------
    def latest_state(self) -> DataFrame:
        """Last-write-wins state per key (etl_controller.py:2444)."""
        return self._q("route_latest_state")

    def verify_asof(self) -> DataFrame:
        """Commands matched to the latest observed state at-or-before
        their timestamp (etl_controller.py:2446-2448)."""
        return self._q("asof_latest_order")

    def merged_devices(self) -> DataFrame:
        """Multi-device scatter-gather with cumulative key offsets
        (etl_controller.py:3040-3084)."""
        return self._q("scatter_gather_offset_union")

    def device_for_key(self) -> DataFrame:
        """Global key -> (device, local key) range partition
        (etl_controller.py:248-284)."""
        return self._q("range_partition_outputs")

    # -- presets (SS3.3) ---------------------------------------------------
    def apply_preset(self) -> DataFrame:
        return self._q("preset_apply_merge")

    def save_preset_scoped(self) -> DataFrame:
        return self._q("preset_save_scoped")

    # -- groups & display --------------------------------------------------
    def group_islands(self) -> DataFrame:
        """Consecutive-key display groups (etl_controller.py:286-330)."""
        return self._q("display_group_islands")

    def format_ranges(self) -> DataFrame:
        """Key set as a '1-3, 7' RLE string (etl_controller.py:102-125)."""
        return self._q("format_range_rle")

    # -- telemetry ---------------------------------------------------------
    def health_rate(self) -> DataFrame:
        """Daily availability (etl_controller.py:3119-3136)."""
        return self._q("conn_health_rate")

    def hourly_counts(self) -> DataFrame:
        return self._q("tumbling_hour_counts")

    def sessions(self) -> DataFrame:
        return self._q("session_windows")

    def chassis_telemetry(self) -> DataFrame:
        """Parsed chassis frames (etl_controller.py:741-795)."""
        return self._q("chassis_regex_extract")

    # -- exports -----------------------------------------------------------
    def denormalized_routes(self) -> DataFrame:
        return self._q("routes_csv_denorm")

    def export_csv(self, path: str) -> None:
        from etl_rf_matrix_controller_spark.operators.joins import (
            export_routes_csv,
        )

        export_routes_csv(self.denormalized_routes(), path)

    # -- training-data pipeline --------------------------------------------
    def dedup_exact(self) -> DataFrame:
        return self._q("dedup_exact_docs")

    def near_duplicates(self) -> DataFrame:
        """MinHash+LSH candidates verified by shingle Jaccard."""
        return self._q("minhash_near_dup_pairs")

    def similar_vectors(self, index: str = "flat") -> DataFrame:
        """Top-k vector search at the chosen index tier: 'flat' (exact
        brute force), 'lsh' (sign-bucket ANN), 'ivf' (inverted lists),
        or 'ivfpq' (product-quantized lists + exact refine, the
        memory-bound 100 TB tier)."""
        return self._q(
            {
                "flat": "knn_brute_force",
                "lsh": "ann_lsh_topk",
                "ivf": "ann_ivf_topk",
                "ivfpq": "ann_ivfpq_topk",
            }[index]
        )

    def span_duplicates(self) -> DataFrame:
        """Maximal >=40-char verbatim spans repeated across documents
        (exact substring dedup, Lee et al. 2022 family)."""
        return self._q("substring_span_dups")

    def parallel_pairs(self) -> DataFrame:
        """Cross-group mutual nearest neighbors (bitext mining shape)."""
        return self._q("cross_label_mutual_knn")

    def privacy_risk_cells(self) -> DataFrame:
        """Quasi-identifier combos below the k-anonymity threshold."""
        return self._q("k_anonymity_risk")

    def experiment_variance_report(self) -> DataFrame:
        """CUPED theta + achievable variance reduction per event type."""
        return self._q("cuped_variance_reduction")

    def document_quality(self) -> DataFrame:
        return self._q("doc_quality_score")

    def language_id(self) -> DataFrame:
        return self._q("lang_id_markers")

    def decode_media(self) -> DataFrame:
        return self._q("multimodal_decode_features")

    def search(self, ranking: str = "bm25") -> DataFrame:
        """Ranked retrieval for the fixed probe query: 'bm25' (length-
        normalized) or 'tfidf'."""
        return self._q(
            "bm25_retrieval_topk" if ranking == "bm25" else "tfidf_retrieval_topk"
        )

    def decontaminate(self, tier: str = "exact") -> DataFrame:
        """Train/eval leakage audit at the chosen tier: 'exact' (content
        hash), 'ngram' (n-gram overlap), or 'semantic' (embedding
        cosine, LSH-blocked)."""
        return self._q(
            {
                "exact": "split_contamination_check",
                "ngram": "ngram_contamination",
                "semantic": "semantic_contamination_check",
            }[tier]
        )

    def event_sequences(self) -> DataFrame:
        """Per-user time-ordered event sequences (first 10)."""
        return self._q("user_event_sequences")

    def curriculum(self) -> DataFrame:
        """Quality-quartile curriculum stages with token budgets."""
        return self._q("curriculum_quality_bins")

    def storage_advice(self) -> DataFrame:
        """Per-column NDV-ratio parquet-encoding recommendations."""
        return self._q("column_encoding_advisor")

    def column_histogram(self) -> DataFrame:
        """Equi-depth (CBO-style) histogram of the value column."""
        return self._q("equidepth_value_bands")

    def flap_alarms(self) -> DataFrame:
        """Keys whose state changed >= 3 times in a day (oscillation)."""
        return self._q("route_flap_detection")

    def score_corpus(self) -> DataFrame:
        """Arrow-batched model-inference scores over documents."""
        return self._q("model_inference_scores")

    # -- escape hatch ------------------------------------------------------
    def query(self, name: str) -> DataFrame:
        """Any declared operator by SURVEY SS2 query id."""
        return self._q(name)

    def sql(self, statement: str) -> DataFrame:
        from etl_rf_matrix_controller_spark.sources.views import sql

        return sql(self.spark, self.sf_dir, statement)
