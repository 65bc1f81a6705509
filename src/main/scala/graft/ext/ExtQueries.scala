package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Registration of the training-data-pipeline extension operators
 * (SURVEY.md §2.4) in the driver contract. Every SQL-expressible operator
 * carries a DuckDB oracle implementing the identical math (md5-based
 * hashes, in-order double folds) — including the stub-decoder pipeline,
 * whose deterministic fake byte math is mirrored in SQL.
 */
object ExtQueries {

  /** DuckDB cosine between two FLOAT[] expressions — bit-identical to
    * [[Similarity.cosine]]'s double fold (verified empirically). The
    * DOUBLE[] casts are load-bearing: on FLOAT[] inputs DuckDB computes the
    * whole similarity in float32 and drifts from Spark's double math. */
  private def cosSql(a: String, b: String): String =
    s"list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_dedup_exact" -> (Dedup.exactDedup _),
    "x2_dedup_ngram" -> ((s: SparkSession, d: String) =>
      Dedup.ngramJaccardPairs(s, d)),
    "x3_dedup_minhash" -> ((s: SparkSession, d: String) =>
      Dedup.minhashLshPairs(s, d)),
    "x4_dedup_simhash" -> (Dedup.simhash _),
    "x5_knn_brute" -> ((s: SparkSession, d: String) =>
      Similarity.knnBrute(s, d)),
    // x50: contrastive hard-negative mining — top-k most-similar vectors
    // with a DIFFERENT label, the label inequality fused into the
    // candidate scan before ranking.
    "x50_hard_negatives" -> ((s: SparkSession, d: String) =>
      Similarity.hardNegatives(s, d)),
    // x51: token-window chunking with stride — the sequence-prep step in
    // front of tokenize-and-pack; map-only explode+slice, no shuffle.
    "x51_chunk" -> ((s: SparkSession, d: String) =>
      TextAnalysis.chunkTokens(s, d)),
    // x52: epoch-aware deterministic training shuffle — md5 order keys,
    // map-only batch assignment, (epoch, batch)-partitioned positions.
    "x52_epoch_shuffle" -> ((s: SparkSession, d: String) =>
      TextAnalysis.epochShuffle(s, d)),
    // x53: regex PII redaction over a planted-PII corpus — map-only
    // scrub to typed placeholders plus per-doc match counts.
    "x53_pii_redact" -> ((s: SparkSession, d: String) =>
      TextAnalysis.piiRedact(s, d)),
    // x54: exact class balancing — every stratum cut to the smallest
    // stratum's size by md5-ranked window, target via 1-row broadcast.
    "x54_class_balance" -> ((s: SparkSession, d: String) =>
      TextAnalysis.classBalance(s, d)),
    // x55: GPT-style concatenation packing — the per-shard doc stream
    // cut at context boundaries via one running-sum window.
    "x55_concat_pack" -> ((s: SparkSession, d: String) =>
      TextAnalysis.concatPack(s, d)),
    // x56: interpolated bigram LM scoring — postings-join nll with
    // 9dp-rounded DECIMAL-summed contributions (x22/x30's recipe).
    "x56_bigram_nll" -> ((s: SparkSession, d: String) =>
      TextAnalysis.bigramNll(s, d)),
    // x57: incremental near-dup against the accumulated corpus — minhash
    // band join strictly new-batch x corpus, never corpus x corpus.
    "x57_incremental_dedup" -> ((s: SparkSession, d: String) =>
      Dedup.incrementalDedup(s, d)),
    // x58: canonical text normalization (casefold + whitespace collapse
    // + trim) over a planted-mess corpus; map-only.
    "x58_normalize" -> ((s: SparkSession, d: String) =>
      TextAnalysis.normalizeText(s, d)),
    // x59: "index once, query many" — x57's corpus signatures persisted
    // as a band-key-bucketed table; the batch joins the STORED index
    // (no corpus rescan / re-shingling at query time).
    "x59_dedup_index_reuse" -> ((s: SparkSession, d: String) =>
      Dedup.dedupIndexReuse(s, d)),
    // x60: the COMPOSED curation pipeline — normalize → near-dup prune →
    // decontaminate → chunk → pack → epoch-shuffle in ONE Catalyst plan
    // (see CurationPipeline.curate); the reason the ext family exists.
    "x60_pipeline" -> ((s: SparkSession, d: String) =>
      CurationPipeline.curate(s, d)),
    "x6_ann_ivf" -> ((s: SparkSession, d: String) =>
      Similarity.annIvf(s, d)),
    // x61: x6's IVF with the build persisted — centroid + bucketed
    // assignment tables written once, the probe joins the STORED index
    // (no embeddings rescan, no k-means rerun at query time).
    "x61_ann_index_reuse" -> ((s: SparkSession, d: String) =>
      Similarity.annIndexReuse(s, d)),
    // x62/x63: the PROBE-ONLY sides of x59/x61 — index reused if already
    // built this session; the bench delta vs x59/x61 is probe ≪ build.
    "x62_dedup_index_probe" -> ((s: SparkSession, d: String) =>
      Dedup.dedupIndexProbe(s, d)),
    "x63_ann_index_probe" -> ((s: SparkSession, d: String) =>
      Similarity.annIndexProbe(s, d)),
    // x64: segment-append maintenance — batch-1 signatures persisted as
    // their own bucketed segment; batch-2 probes corpus + appended.
    "x64_dedup_index_append" -> ((s: SparkSession, d: String) =>
      Dedup.dedupIndexAppend(s, d)),
    // x93: index maintenance AS A STREAM — per-micro-batch signature
    // segments committed from foreachBatch (idempotent, replay-proof);
    // probing corpus ∪ stream segments equals the batch append.
    "x93_stream_index_append" -> ((s: SparkSession, d: String) =>
      Dedup.streamingIndexAppend(s, d)),
    // x88: segment COMPACTION — one bucketed rewrite of the signature
    // rows (no recompute, no corpus pass); probing the merge must equal
    // x64's per-segment union, the proof nothing was lost.
    "x88_index_merge" -> ((s: SparkSession, d: String) =>
      Dedup.dedupIndexMerge(s, d)),
    // x94: ES cardinality agg (Kibana Unique Count) from first
    // principles — every HLL register and the register-max merge
    // hash-checked, estimates next to exact distinct counts.
    "x94_hll_cardinality" -> ((s: SparkSession, d: String) =>
      Sketches.hllCardinality(s, d)),
    // x95: PageRank over the cluster-scoped kNN similarity graph —
    // exact integer nano-unit rounds, O(E) per iteration.
    "x95_pagerank" -> ((s: SparkSession, d: String) =>
      Similarity.pageRank(s, d)),
    // x97: IVF+PQ serving path — bucket prune + asymmetric distance
    // over PQ codes, LUT cells frozen to integer micro-units.
    "x97_ivfpq_search" -> ((s: SparkSession, d: String) =>
      Similarity.ivfPqSearch(s, d)),
    // x102: the PROBE-ONLY side — both quantizer trainings + the
    // coding pass persist once; queries hit the stored codes table.
    "x102_ivfpq_probe" -> ((s: SparkSession, d: String) =>
      Similarity.ivfPqProbe(s, d)),
    // x131: OUT-OF-CORPUS serving — unseen query vectors assigned via
    // the PERSISTED coarse centroids, ADC over the stored codes only.
    "x131_ivfpq_serve" -> ((s: SparkSession, d: String) =>
      Similarity.ivfPqServe(s, d)),
    // x98: perceptual (aHash) image near-dup pairs over the REAL PPM
    // codec, banded Manku pigeonhole join == all-pairs truth.
    "x98_image_phash" -> ((s: SparkSession, d: String) =>
      Multimodal.imagePhashPairs(s, d)),
    // x103: audio near-dup pairs — per-channel 16-window energy
    // fingerprints over the real WAV chunk walker, 3-band pigeonhole.
    "x103_audio_fingerprint" -> ((s: SparkSession, d: String) =>
      Multimodal.audioFingerprintPairs(s, d)),
    // x104: triangle census per cluster — ordered node-iterator join,
    // exact integer wedge/closure arithmetic.
    "x104_triangles" -> ((s: SparkSession, d: String) =>
      Similarity.triangleCensus(s, d)),
    // x133: label-propagation communities — 4 synchronous rounds of
    // modal-neighbor-label adoption, smallest-label ties; O(E)/round.
    "x133_label_prop" -> ((s: SparkSession, d: String) =>
      Similarity.labelProp(s, d)),
    // x105: Adamic–Adar link prediction — hub-generated candidate
    // pairs, 1/ln(deg) contributions frozen to exact integers.
    "x105_adamic_adar" -> ((s: SparkSession, d: String) =>
      Similarity.adamicAdar(s, d)),
    // x99: unigram-LM (SentencePiece-style) Viterbi tokenization —
    // integer nano-nat piece weights, native max-likelihood DP.
    "x99_unigram_tokenize" -> ((s: SparkSession, d: String) =>
      Bpe.unigramTokenize(s, d)),
    // x137: unigram-LM EM training (Kudo 2018) — K hard-EM rounds on
    // the word-type table: Viterbi E-step, nano-nat M-step, bottom-25%
    // multi-piece prune with the alphabet coverage floor.
    "x137_unigram_em" -> ((s: SparkSession, d: String) =>
      Bpe.unigramEm(s, d)),
    // x100: token-budget epoch allocation (the pretraining data-recipe
    // sheet) — temperature weights frozen to micro ints, exact permille
    // epochs with a 3.0-epoch repeat cap.
    "x100_token_budget" -> ((s: SparkSession, d: String) =>
      TextAnalysis.tokenBudget(s, d)),
    // x101: ES multi_match best_fields — per-field BM25 with per-field
    // statistics, document ranked by its best field.
    "x101_multi_match" -> ((s: SparkSession, d: String) =>
      TextAnalysis.multiMatchBestFields(s, d)),
    // x96: count-min heavy hitters — per-source segments merged
    // cell-wise, exact top-10 probed, per-probe overestimate exact.
    "x96_cms_topk" -> ((s: SparkSession, d: String) =>
      Sketches.cmsHeavyHitters(s, d)),
    // x68: the ANN counterpart — new vectors assigned via STORED
    // centroids (no k-means rerun), own bucketed segment, one GLOBAL
    // top-k across corpus+segment.
    "x68_ann_index_append" -> ((s: SparkSession, d: String) =>
      Similarity.annIndexAppend(s, d)),
    // ANN quality eval: recall@k of the IVF probe vs exact kNN on a
    // query sample — the bucket-pruning health metric as an entry
    "x83_ann_recall" -> ((s: SparkSession, d: String) =>
      Similarity.annRecall(s, d)),
    // ES rank_eval: precision/recall/MRR/DCG@10 for per-term BM25
    // rankings against tf-graded judgments, one postings pass
    "x84_rank_eval" -> ((s: SparkSession, d: String) =>
      TextAnalysis.rankEval(s, d)),
    // dataset card: per-source release summary — exact integer counts,
    // sums, permille, dup tallies, vocab size, top token
    "x85_dataset_card" -> ((s: SparkSession, d: String) =>
      TextAnalysis.datasetCard(s, d)),
    // ε-DP count release: md5-seeded Laplace noise in exact nano-units
    "x91_dp_release" -> ((s: SparkSession, d: String) =>
      TextAnalysis.dpRelease(s, d)),
    // k-anonymity: (segment, nation) groups < k generalize to region,
    // still-small groups suppressed — the microdata release discipline
    "x92_k_anonymity" -> ((s: SparkSession, d: String) =>
      TextAnalysis.kAnonymize(s, d)),
    // dedup quality eval: precision/recall of LSH candidates vs exact
    // Jaccard truth — the banding-parameter tuning metric as an entry
    "x86_dedup_eval" -> ((s: SparkSession, d: String) =>
      Dedup.dedupEval(s, d)),
    "x7_langid" -> (TextAnalysis.langId _),
    "x8_quality" -> (TextAnalysis.qualityScore _),
    // model-based quality filter: hashed-linear (fastText-style)
    // classifier scored by a native map-only expression
    "x70_quality_classifier" -> (TextAnalysis.qualityClassifier _),
    "x9_tokens" -> (TextAnalysis.tokenCounts _),
    "x10_fingerprint" -> (TextAnalysis.fingerprint _),
    "x11_media_meta" -> (Multimodal.mediaMetadata _),
    // real PPM codec: synthetic-but-valid P6 files decoded by a real
    // header parser; the oracle recomputes the closed-form pixel stats
    // in SQL, so any encoder/parser off-by-one breaks the hash
    "x12_media_decode" -> (Multimodal.decodeFeatures _),
    // video frame sampling: real concatenated-PPM stream container,
    // header-parsed frame walk, every 2nd frame decoded to exact stats
    "x82_video_frames" -> ((s: SparkSession, d: String) =>
      Multimodal.frameSampleStats(s, d)),
    // real box-filter resize: encode → decode → downsample → re-encode →
    // decode; both codec directions exercised
    "x65_media_resize" -> (Multimodal.resizeFeatures _),
    // real RIFF/WAVE chunk walk + PCM16 decode, per-channel energy stats
    "x66_wav_decode" -> (Multimodal.wavChannelStats _),
    // deterministic stratified train/val/test hash split (audit table)
    "x67_split" -> (TextAnalysis.stratifiedSplit _),
    // corpus snapshot diff: added/removed/changed by content hash — one
    // full-outer join of the two releases' (doc_id, md5) projections
    "x72_snapshot_diff" -> (TextAnalysis.snapshotDiff _),
    // tokenizer-training vocab: global token counts, top-V, exact
    // integer cumulative coverage (ppm floor division)
    "x73_vocab_build" -> ((s: SparkSession, d: String) =>
      TextAnalysis.vocabBuild(s, d)),
    // deterministic range-sharded export: exact-percentile boundaries
    // over a bounded 24-bit key domain (repartitionByRange without the
    // run-to-run sampling), per-shard audit table
    "x74_range_shards" -> ((s: SparkSession, d: String) =>
      TextAnalysis.rangeShards(s, d)),
    // real Sennrich BPE training: K merge rounds on the bounded
    // word-TYPE table (one corpus pass total); output = the rule table
    "x75_bpe_train" -> (Bpe.bpeTrain _),
    // CCNet perplexity stratification: exact nano-nat unigram NLL,
    // head/middle/tail at exact quartile boundaries, tail dropped
    "x77_ccnet_buckets" -> (TextAnalysis.ccnetBuckets _),
    // product quantization: per-subspace Euclidean codebooks, encoding
    // as ONE literal-fold map-only projection (scan-speed PQ)
    "x78_pq" -> ((s: SparkSession, d: String) => Similarity.pq(s, d)),
    // DSIR importance resampling: hashed-bigram log-ratio weights in
    // exact nano-nats, native map-only scoring, Gumbel top-k selection
    "x79_dsir" -> ((s: SparkSession, d: String) =>
      TextAnalysis.dsirSelect(s, d)),
    // apply the learned merges: per-doc subword totals, words tokenized
    // once on the type table, never per occurrence
    "x76_bpe_tokenize" -> (Bpe.bpeTokenize _),
    // tokenizer eval: per-source fertility + bytes/token of the trained
    // BPE — exact integer permille
    "x87_tokenizer_eval" -> (Bpe.tokenizerEval _),
    // hybrid search: BM25 ∪ dense-vector rankings fused by RRF (rank-only)
    "x69_hybrid_rrf" -> ((s: SparkSession, d: String) =>
      Similarity.hybridRrf(s, d)),
    // MMR diversified re-rank: greedy λ·rel − (1−λ)·max-sim-to-selected
    // over the bounded top-N page, exact int64 micro-unit scores
    "x80_mmr" -> ((s: SparkSession, d: String) =>
      Similarity.mmrRerank(s, d)),
    // JL random projection 64→16: md5-sign matrix, one codegen'd map-only
    // pass, exact integer micro-unit sketches + norm audit
    "x81_random_projection" -> ((s: SparkSession, d: String) =>
      Similarity.randomProjection(s, d)),
    "x13_dedup_embed" -> ((s: SparkSession, d: String) =>
      Similarity.embedNearDupPairs(s, d)),
    // SemDeDup: k-means-cluster-scoped semantic dedup, keep-farthest-
    // from-centroid dominance rule
    "x71_semdedup" -> ((s: SparkSession, d: String) =>
      Similarity.semDedup(s, d)),
    // SemDeDup cluster-scoping loss: τ-pairs split within/cross cluster
    // against the same shared k-means — the eval-family completion
    "x90_semdedup_eval" -> ((s: SparkSession, d: String) =>
      Similarity.semDedupEval(s, d)),
    "x14_media_frames" -> ((s: SparkSession, d: String) =>
      Multimodal.frameSample(s, d)),
    "x15_tfidf" -> ((s: SparkSession, d: String) =>
      TextAnalysis.tfidfTopTerms(s, d)),
    "x16_anonymize" -> (TextAnalysis.anonymize _),
    "x17_mixture" -> (TextAnalysis.sourceMixture _),
    "x18_langid_ngram" -> (TextAnalysis.langIdNgram _),
    "x19_simhash_pairs" -> ((s: SparkSession, d: String) =>
      Dedup.simhashHammingPairs(s, d)),
    "x20_dedup_embed_lsh" -> ((s: SparkSession, d: String) =>
      Similarity.signLshNearDupPairs(s, d)),
    "x21_dup_clusters" -> ((s: SparkSession, d: String) =>
      Dedup.dupClusters(s, d)),
    "x22_bm25_search" -> ((s: SparkSession, d: String) =>
      TextAnalysis.bm25Search(s, d)),
    "x23_ann_multiprobe" -> ((s: SparkSession, d: String) =>
      Similarity.annMultiProbe(s, d)),
    "x24_unigram_logprob" -> ((s: SparkSession, d: String) =>
      TextAnalysis.unigramLogprob(s, d)),
    "x26_dup_clusters_stars" -> ((s: SparkSession, d: String) =>
      Dedup.dupClustersStars(s, d)),
    "x27_embed_quantize" -> ((s: SparkSession, d: String) =>
      Similarity.quantizeInt8(s, d)),
    "x28_span_dedup" -> ((s: SparkSession, d: String) =>
      Dedup.spanDupStats(s, d)),
    "x29_significant_terms" -> ((s: SparkSession, d: String) =>
      TextAnalysis.significantTerms(s, d)),
    "x30_repetition" -> ((s: SparkSession, d: String) =>
      TextAnalysis.repetitionSignals(s, d)),
    "x31_contamination" -> ((s: SparkSession, d: String) =>
      TextAnalysis.contamination(s, d)),
    // x106: fixed-memory Bloom variant of x31 — k=2 md5-derived bits of
    // 2^20, no false negatives, measured false positives.
    "x106_bloom_decontaminate" -> ((s: SparkSession, d: String) =>
      TextAnalysis.bloomDecontaminate(s, d)),
    // x107: easiest-first stratified curriculum — per-source stage
    // window + round-robin top-k, never a global corpus sort.
    "x107_curriculum" -> ((s: SparkSession, d: String) =>
      TextAnalysis.curriculum(s, d)),
    // x108: DDSketch mergeable quantiles — log-bucket counts, shard
    // segments merged bucket-wise, integer rank read-off.
    "x108_ddsketch" -> ((s: SparkSession, d: String) =>
      Sketches.ddSketchQuantiles(s, d)),
    // x109: ExactSubstr dedup — SLIDING k-gram duplicates merged into
    // maximal islands and excised (x28/x39 tile fixed offsets).
    "x109_exact_substr" -> ((s: SparkSession, d: String) =>
      Dedup.exactSubstrExcise(s, d)),
    // x110: the Gopher quality rule battery — exact-integer metrics
    // per rule plus the composed keep decision.
    "x110_gopher_rules" -> ((s: SparkSession, d: String) =>
      TextAnalysis.gopherRules(s, d)),
    // x111: KMV/theta sketch set ops — the mergeable distinct sketch
    // that, unlike HLL (x94), supports intersection.
    "x111_kmv_theta" -> ((s: SparkSession, d: String) =>
      Sketches.kmvThetaSetOps(s, d)),
    // x112: in-context-pretraining packing — cluster members ordered
    // centroid-outward, packed with the x55 boundary convention.
    "x112_semantic_pack" -> ((s: SparkSession, d: String) =>
      Similarity.semanticPack(s, d)),
    // x113: contrastive triplets — hardest positive + hardest negative
    // per anchor from one broadcast-sample scan, integer-micro margins.
    "x113_triplet_mining" -> ((s: SparkSession, d: String) =>
      Similarity.tripletMining(s, d)),
    // x114: centroid silhouette — map-only distances to the broadcast
    // centroid table, signed micro-sum per label.
    "x114_silhouette" -> ((s: SparkSession, d: String) =>
      Similarity.silhouette(s, d)),
    // x115: tokens-per-10k-chars by language — the multilingual token
    // budget table; exact sums + positive floor-div, never an average.
    "x115_tokenizer_fertility" -> ((s: SparkSession, d: String) =>
      TextAnalysis.tokenizerFertility(s, d)),
    // x116: fixed-width token-length bins with padding-waste basis
    // points — the bucketed-batching audit, pure integer arithmetic.
    "x116_length_bins" -> ((s: SparkSession, d: String) =>
      TextAnalysis.lengthBins(s, d)),
    // x119: scene-cut detection — per-video lag window over the x82
    // walker's exact frame sums; brightness-delta > threshold = cut.
    "x119_scene_cuts" -> ((s: SparkSession, d: String) =>
      Multimodal.sceneCuts(s, d)),
    // x120: k-core decomposition — bounded degree-peel over the
    // cluster-scoped undirected kNN graph, fixed 8-round contract.
    "x120_kcore" -> ((s: SparkSession, d: String) =>
      Similarity.kCore(s, d)),
    // x121: l-diversity audit — distinct sensitive bands and the largest
    // single-value block per quasi-identifier group (x92's gap).
    "x121_l_diversity" -> ((s: SparkSession, d: String) =>
      TextAnalysis.lDiversity(s, d)),
    // x122: per-source unigram entropy in exact nano-nats + type-token
    // ratio permille — the diversity panel of the dataset card.
    "x122_unigram_entropy" -> ((s: SparkSession, d: String) =>
      TextAnalysis.unigramEntropy(s, d)),
    // x123: fill-in-the-middle — md5-seeded (prefix, middle, suffix)
    // cuts re-emitted in PSM sentinel order; map-only, pack-composable.
    "x123_fim_split" -> ((s: SparkSession, d: String) =>
      TextAnalysis.fimSplit(s, d)),
    // x124: T5 span corruption — md5-seeded non-overlapping 3-token
    // spans, sentinel input + sentinel-keyed target, map-only.
    "x124_span_corruption" -> ((s: SparkSession, d: String) =>
      TextAnalysis.spanCorruption(s, d)),
    // x125: VAD-style energy segmentation — 16-frame window mean-square
    // over the real WAV decode, islands of active windows.
    "x125_audio_segments" -> ((s: SparkSession, d: String) =>
      Multimodal.audioSegments(s, d)),
    // x117: MOSS winnowing fingerprints — shared window-min k-gram
    // hashes per doc pair, boilerplate fingerprints df-capped like MOSS.
    "x117_winnowing" -> ((s: SparkSession, d: String) =>
      Dedup.winnowingPairs(s, d)),
    // x126: content-defined chunking (LBFS/FastCDC) block dedup —
    // content-derived cut points, md5 block identity, cross-doc dup
    // coverage in exact integers.
    "x126_cdc_blocks" -> ((s: SparkSession, d: String) =>
      Dedup.cdcBlocks(s, d)),
    // x127: corpus-level line dedup (CCNet/RefinedWeb boilerplate
    // removal) — lines shared by >= 3 docs drop, docs reassemble in
    // order with exact removed-line/char counts.
    "x127_line_dedup" -> ((s: SparkSession, d: String) =>
      Dedup.lineDedup(s, d)),
    // x128: URL canonicalization + RefinedWeb per-domain quota — docs
    // ranked inside their PUBLIC-SUFFIX-AWARE registered domain by
    // md5(canonical url), capped at 5 per domain via the mega-domain-
    // safe two-phase rank (no window ever sorts a whole domain).
    "x128_domain_cap" -> ((s: SparkSession, d: String) =>
      UrlOps.domainCap(s, d)),
    // x139: opt-out/compliance filter — broadcast registry of opted-out
    // REGISTERED domains anti-gates the corpus map-side; exact
    // per-source drop accounting for the dataset card.
    "x139_optout_filter" -> ((s: SparkSession, d: String) =>
      UrlOps.optOutFilter(s, d)),
    // x129: 60-bit shingle-fingerprint near-dup pairs (Manku's
    // production design) — x19's scale path: wide signature + shingle
    // features keep the output near-dup-sized (the sf1 probe measured
    // unigram-32 emitting ~12% of ALL pairs).
    "x129_simhash64_pairs" -> ((s: SparkSession, d: String) =>
      Dedup.simhash64Pairs(s, d)),
    // x130: leakage-aware split — x67's hash split keyed on the
    // near-dup CLUSTER, so a train doc's near-duplicate can never land
    // in test (Lee et al. 2022 §5).
    "x130_leakage_split" -> ((s: SparkSession, d: String) =>
      Dedup.leakageSplit(s, d)),
    // x118: matryoshka dimension-truncation recall — top-k under 64/32/16
    // prefix dims vs the full-dim truth set, exact integer ppm.
    "x118_matryoshka" -> ((s: SparkSession, d: String) =>
      Similarity.matryoshkaRecall(s, d)),
    // x138: margin-based bitext mining (Artetxe & Schwenk 2019) —
    // distance margin in scaled integer units over frozen 6dp cosines,
    // forward-backward mutual-best consistency filter.
    "x138_bitext_mine" -> ((s: SparkSession, d: String) =>
      Similarity.bitextMine(s, d)),
    // x140: the ANN-legged bitext miner — both kNN legs are the
    // bucketed IVF probe (one bucket equi-join replaces the capped
    // crossJoin; the FAISS-indexed mining of the paper), margin +
    // mutual-best reused verbatim downstream.
    "x140_bitext_ann" -> ((s: SparkSession, d: String) =>
      Similarity.bitextMineAnn(s, d)),
    // x141: filtered kNN (ES 8 knn + filter, PRE-filter semantics) —
    // the label predicate constrains candidates before/within the
    // bucket probe and reaches the parquet scan as a pushed filter.
    "x141_filtered_knn" -> ((s: SparkSession, d: String) =>
      Similarity.filteredKnn(s, d)),
    // x142: subword-regularization n-best segmentation (Kudo 2018 §4)
    // — top-3 segmentations per word TYPE under the x137-trained
    // unigram vocab, native n-best DP, (score DESC, path ASC) order.
    "x142_unigram_nbest" -> ((s: SparkSession, d: String) =>
      Bpe.unigramNbest(s, d)),
    // x143: ES 8.16 `linear` retriever — min-max-normalized weighted
    // score fusion of the BM25 and dense legs, all-integer (micro
    // freeze -> ppm floor division -> integer weights).
    "x143_linear_fusion" -> ((s: SparkSession, d: String) =>
      Similarity.linearFusion(s, d)),
    // x144: composed retriever TREE (ES 8.14+ nestable retrievers) —
    // rrf over [the x143 linear node, a label-filtered dense knn leg];
    // ranks-only at the rrf boundary, so the legs compose arbitrarily.
    "x144_retriever_tree" -> ((s: SparkSession, d: String) =>
      Similarity.retrieverTree(s, d)),
    // x145: sampled segmentation (Kudo 2018 §4's α-sampling) — each
    // word occurrence draws from its n-best list via deterministic
    // md5-Gumbel argmax at α = 1/5 (score + 5·gumbel in nano units).
    "x145_unigram_sample" -> ((s: SparkSession, d: String) =>
      Bpe.unigramSample(s, d)),
    // x146: ES 8.15+ `rescorer` retriever — exact-cosine re-score over
    // the top-5 window of the x144 tree, tail ranks untouched.
    "x146_rescorer" -> ((s: SparkSession, d: String) =>
      Similarity.rescorerRetriever(s, d)),
    // x147: tokenizer fertility eval — pieces-per-word and
    // chars-per-piece per langid bucket over the x137-trained vocab,
    // exact integer micro-units.
    "x147_fertility" -> ((s: SparkSession, d: String) =>
      Bpe.tokenizerFertility(s, d)),
    "x32_dedup_containment" -> ((s: SparkSession, d: String) =>
      Dedup.containmentPairs(s, d)),
    "x33_ngram_novelty" -> ((s: SparkSession, d: String) =>
      Dedup.ngramNovelty(s, d)),
    "x34_keep_best" -> ((s: SparkSession, d: String) =>
      Dedup.keepBestInCluster(s, d)),
    // x35: the ES-analyzer proof — BM25 over a deterministically
    // "messified" corpus (UPPERCASED, every space replaced by ", ") with
    // MIXED-CASE query terms. The analyzer must recover the exact clean
    // token stream on both engines or every score diverges.
    // ES terms_set query: match docs containing >= m of the k analyzed
    // terms — one map-only scan, the membership count in the scan stage
    "x89_terms_set" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      val terms = array(Seq("spark", "query", "stream").map(lit): _*)
      val matched = size(array_intersect(
        array_distinct(graft.functions.AnalyzeTokens.analyze(col("text"))),
        terms)).cast("long")
      graft.ingest.Tables.load(s, d, "documents")
        .select(col("doc_id"), matched.as("n_matched"))
        .where(col("n_matched") >= 2)
        .orderBy(col("doc_id"))
    }),
    "x35_analyzed_search" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      val messy = graft.ingest.Tables.load(s, d, "documents")
        .select(col("doc_id"),
          upper(regexp_replace(col("text"), " ", ", ")).as("text"))
      TextAnalysis.bm25(messy, "doc_id", "text",
        Seq("Spark", "QUERY", "Stream"), 20)
    }),
    "x36_weighted_sample" -> ((s: SparkSession, d: String) =>
      TextAnalysis.weightedSample(s, d)),
    "x37_embed_cohesion" -> ((s: SparkSession, d: String) =>
      Similarity.embedCohesion(s, d)),
    // x132: UniMax language sampling — epoch-capped water-filling over
    // the language histogram (ascending), md5-rank selection per lang.
    "x132_unimax_mixture" -> ((s: SparkSession, d: String) =>
      TextAnalysis.unimaxMixture(s, d)),
    // x134: Poisson-bootstrap CI — all B resamples in ONE corpus pass,
    // frozen integer CDF thresholds, order-statistic interval.
    "x134_bootstrap_ci" -> ((s: SparkSession, d: String) =>
      TextAnalysis.bootstrapCi(s, d)),
    // x135: Cohen's kappa between the heuristic gate and the classifier
    // — exact integer confusion counts, sign-split truncating division.
    "x135_filter_agreement" -> ((s: SparkSession, d: String) =>
      TextAnalysis.filterAgreement(s, d)),
    // x136: unigram KL drift between snapshots — 9dp-ln nano-nat exact
    // integers over the union vocab, one vocab-sized join.
    "x136_unigram_drift" -> ((s: SparkSession, d: String) =>
      TextAnalysis.unigramDrift(s, d)),
    "x38_temperature_mixture" -> ((s: SparkSession, d: String) =>
      TextAnalysis.temperatureMixture(s, d)),
    "x39_span_excise" -> ((s: SparkSession, d: String) =>
      Dedup.spanExcise(s, d)),
    // x40: analyzed match_phrase over a deterministically messified corpus
    // (UPPERCASED, spaces → ", "): the mixed-case punctuated query phrase
    // "Spark, QUERY!" must match docs where the tokens [spark, query]
    // appear CONSECUTIVELY — both the analyzer and the positional check
    // have to agree across engines.
    "x40_phrase_match" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      graft.ingest.Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"),
          upper(regexp_replace(col("text"), " ", ", ")).as("text"))
        .where(graft.functions.PhraseMatch.phrase(col("text"), "Spark, QUERY!"))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),
    // x41: the composed curation decision table — x28 span-dup gate, x8
    // quality gate, x17 mixture gate, first-failing-reason triage, all in
    // ONE plan (see TextAnalysis.curationDecisions).
    "x41_curation_decisions" -> ((s: SparkSession, d: String) =>
      TextAnalysis.curationDecisions(s, d)),
    // x42: ordered proximity (ES/Lucene span_near in_order) — the phrase
    // tokens [spark, query] must appear IN ORDER within one interleaved
    // position (slop 1): "spark fast query" matches, "query spark" does
    // not. Both the anchor scan and the greedy window subsequence are
    // mirrored in the oracle.
    "x42_ordered_near" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      graft.ingest.Tables.load(s, d, "documents")
        .where(graft.functions.PhraseMatch.near(col("text"), "Spark Query!", 1))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),
    // x44: ES more_like_this — the query doc's top TF-IDF terms become
    // data-driven BM25 search terms (broadcast, no plan-time literals).
    "x44_more_like_this" -> ((s: SparkSession, d: String) =>
      TextAnalysis.moreLikeThis(s, d)),
    // x47: decontamination excision — tokens covered by any test-set
    // sliding span are cut, text rebuilt from survivors (x31's report
    // turned into the removal transform; test spans broadcast).
    "x47_decontaminate" -> ((s: SparkSession, d: String) =>
      TextAnalysis.decontaminate(s, d)),
    // x46: sharded batch-packing assignment — longest-first round-robin
    // bins per md5 shard, the sequence-packing prep step.
    "x46_pack_bins" -> ((s: SparkSession, d: String) =>
      TextAnalysis.packBins(s, d)),
    // x49: the same sharding with TRUE per-shard LPT (least-loaded-bin
    // placement, 4/3-optimal makespan) via the native LptAssign fold
    // over rank-ordered per-shard size arrays.
    "x49_pack_lpt" -> ((s: SparkSession, d: String) =>
      TextAnalysis.packBinsLpt(s, d)),
    // x45: ES term suggester (the Kibana autocomplete box): analyzed
    // terms with the typed prefix, ranked by document frequency —
    // per-doc-distinct explode so count(*) IS the df, one agg + top-k.
    "x45_suggest" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      graft.ingest.Tables.load(s, d, "documents")
        .select(explode(array_distinct(
          graft.functions.AnalyzeTokens.analyze(col("text")))).as("term"))
        .where(col("term").startsWith("sp"))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("term"))
        .limit(10)
    }),
    // x48: Lucene fuzzy search (`term~`, ES fuzziness) — planted typos in
    // a messified corpus: every third doc's 'spark' tokens are corrupted
    // to 'sprk', then the whole text is UPPERCASED with ", " separators
    // (the x35/x40 messification). The AUTO-distance fuzzy term 'Spark!'
    // (analyzes to 'spark', len 5 -> distance 1) must find BOTH the clean
    // and the typo'd docs — analyzer + Levenshtein agree across engines.
    "x48_fuzzy_match" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      graft.ingest.Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"),
          upper(regexp_replace(
            when(col("doc_id") % 3 === 0,
              regexp_replace(col("text"), "spark", "sprk"))
              .otherwise(col("text")),
            " ", ", ")).as("text"))
        .where(graft.functions.FuzzyMatch.fuzzy(col("text"), "Spark!"))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),
    // x43: ES highlighting (the Kibana Discover match-fragment feature):
    // for docs whose analyzed stream contains the term, emit the ±2-token
    // window around EACH of the first `number_of_fragments`=3 occurrences
    // (ES returns top-N fragments per doc, not just the first match),
    // every in-window match wrapped in <em> tags. Bounded and map-only:
    // occurrence positions come from the NATIVE short-circuiting
    // token_positions scan (the declarative filter-over-sequence form
    // was 20x slower — interpreted lambda per token), capped at 3
    // BEFORE the explode, so the fanout is <=3 rows per matching doc;
    // presentation-layer lambdas remain only in the per-fragment <=5-
    // token window wrap.
    "x43_highlight" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      graft.ingest.Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"),
          graft.functions.TokenPositions.positionsOf(col("text"), "spark", 3)
            .as("occs"))
        .where(size(col("occs")) > 0)
        .select(col("doc_id"),
          graft.functions.AnalyzeTokens.analyze(col("text")).as("toks"),
          col("occs"))
        .select(col("doc_id"), col("toks"),
          posexplode(col("occs")).as(Seq("idx0", "pos")))
        .withColumn("fragment_idx", col("idx0") + 1)
        .withColumn("w_start", greatest(lit(1), col("pos") - 2))
        .withColumn("w_end", least(size(col("toks")), col("pos") + 2))
        .select(col("doc_id"), col("fragment_idx"),
          concat_ws(" ", transform(
            slice(col("toks"), col("w_start"),
              col("w_end") - col("w_start") + 1),
            t => when(t === "spark", concat(lit("<em>"), t, lit("</em>")))
              .otherwise(t))).as("fragment"))
        .orderBy(col("doc_id"), col("fragment_idx"))
    })
  )

  /** Squared-L2 between a subvector and a codebook row, as the SAME
    * left-fold association as Spark's codegen'd `reduce(_ + _)`. */
  private def pqDistSql(sub: String, cv: String): String =
    s"list_reduce(list_transform(range(1, 17), i -> " +
      s"($sub[i] - $cv[i]) * ($sub[i] - $cv[i])), (a, b) -> a + b)"

  /** One per-subspace Euclidean assignment CTE against `$cb`. */
  private def pqAsgSql(name: String, cb: String): String =
    s"""$name AS MATERIALIZED (SELECT vec_id, s, sub, c FROM (
       |    SELECT b.vec_id, b.s, b.sub, cb.c, row_number() OVER (
       |        PARTITION BY b.vec_id, b.s
       |        ORDER BY round(${pqDistSql("b.sub", "cb.cv")}, 6), cb.c)
       |      AS rn
       |    FROM sub b JOIN $cb cb ON cb.s = b.s) WHERE rn = 1)""".stripMargin

  /** One per-subspace Lloyd step (assignment + exact decimal means). */
  private def pqStepSql(i: Int): String =
    s"""${pqAsgSql(s"pasg$i", s"cb$i")},
       |pm$i AS MATERIALIZED (SELECT s, c, pos,
       |    CAST(sum(CAST(val AS DECIMAL(38,15))) AS DOUBLE) / count(*) AS m
       |  FROM (SELECT s, c, unnest(sub) AS val,
       |          generate_subscripts(sub, 1) AS pos FROM pasg$i)
       |  GROUP BY 1, 2, 3),
       |cb${i + 1} AS MATERIALIZED (
       |  SELECT cb.s, cb.c, COALESCE(n.cv, cb.cv) AS cv
       |  FROM cb$i cb LEFT JOIN (SELECT s, c, list(m ORDER BY pos) AS cv
       |                          FROM pm$i GROUP BY 1, 2) n
       |    ON n.s = cb.s AND n.c = cb.c)""".stripMargin

  /** x78's oracle: the full per-subspace PQ replay — 2 Euclidean Lloyd
    * steps per subspace, then the coding pass (rounded-distance argmin
    * with lowest-c ties; reconstruction error from FULL-precision
    * minima added in fixed s-order, exactly [[Similarity.pq]]). */
  private lazy val pqSql: String = {
    val cs = (0 until 4).map(s =>
      s"MAX(CASE WHEN s = $s THEN c END) AS c$s").mkString(", ")
    val es = (0 until 4).map(s =>
      s"MAX(CASE WHEN s = $s THEN mind END) AS e$s").mkString(", ")
    val cOut = (0 until 4).map(s => s"CAST(c$s AS BIGINT) AS c$s")
      .mkString(", ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |           FROM embeddings),
       |sub AS MATERIALIZED (SELECT vec_id, s,
       |    list_slice(emb, s * 16 + 1, (s + 1) * 16) AS sub
       |  FROM e, UNNEST([0, 1, 2, 3]) AS t(s)),
       |cb0 AS MATERIALIZED (SELECT s, CAST(vec_id AS INT) AS c, sub AS cv
       |  FROM sub WHERE vec_id < 4),
       |${pqStepSql(0)},
       |${pqStepSql(1)},
       |fc AS (SELECT vec_id, s, c, mind FROM (
       |    SELECT b.vec_id, b.s, cb.c,
       |      row_number() OVER (PARTITION BY b.vec_id, b.s
       |        ORDER BY round(${pqDistSql("b.sub", "cb.cv")}, 6), cb.c)
       |        AS rn,
       |      min(${pqDistSql("b.sub", "cb.cv")}) OVER (
       |        PARTITION BY b.vec_id, b.s) AS mind
       |    FROM sub b JOIN cb2 cb ON cb.s = b.s) WHERE rn = 1),
       |pv AS (SELECT vec_id, $cs, $es FROM fc GROUP BY vec_id)
       |SELECT vec_id, $cOut, round(((e0 + e1) + e2) + e3, 6) AS err
       |FROM pv ORDER BY vec_id""".stripMargin
  }

  /** x97's oracle: shared cosine-kmeans buckets (IVF) + the x78 PQ
    * codebook replay, then ADC via an EXPLICIT (query, s, c) LUT join —
    * the join formulation of the Spark side's inlined CASE; every cell
    * 6dp-rounded then frozen to integer micro-units, summed as int64. */
  private lazy val ivfPqSql: String = {
    s"""WITH $kmeansCtes,
       |sub AS MATERIALIZED (SELECT vec_id, s,
       |    list_slice(emb, s * 16 + 1, (s + 1) * 16) AS sub
       |  FROM e, UNNEST([0, 1, 2, 3]) AS t(s)),
       |cb0 AS MATERIALIZED (SELECT s, CAST(vec_id AS INT) AS c, sub AS cv
       |  FROM sub WHERE vec_id < 4),
       |${pqStepSql(0)},
       |${pqStepSql(1)},
       |codes AS MATERIALIZED (SELECT vec_id, s, c FROM (
       |    SELECT b.vec_id, b.s, cb.c, row_number() OVER (
       |        PARTITION BY b.vec_id, b.s
       |        ORDER BY round(${pqDistSql("b.sub", "cb.cv")}, 6), cb.c)
       |      AS rn
       |    FROM sub b JOIN cb2 cb ON cb.s = b.s) WHERE rn = 1),
       |lut AS MATERIALIZED (SELECT q.vec_id AS query_id, cb.s, cb.c,
       |    CAST(CAST(round(${pqDistSql("q.sub", "cb.cv")}, 6)
       |         AS DECIMAL(12,6)) * 1000000 AS BIGINT) AS cell
       |  FROM (SELECT vec_id, s, sub FROM sub WHERE vec_id < 10) q
       |  JOIN cb2 cb ON cb.s = q.s),
       |adc AS (SELECT l.query_id, c.vec_id AS cand_id,
       |    CAST(sum(l.cell) AS BIGINT) AS adc_micro
       |  FROM codes c JOIN lut l ON l.s = c.s AND l.c = c.c
       |  GROUP BY 1, 2),
       |qb AS (SELECT vec_id AS query_id, bucket FROM asg
       |       WHERE vec_id < 10),
       |r AS (SELECT a.query_id, qb.bucket, a.cand_id, a.adc_micro,
       |    row_number() OVER (PARTITION BY a.query_id
       |      ORDER BY a.adc_micro, a.cand_id) AS rn
       |  FROM adc a
       |  JOIN qb ON a.query_id = qb.query_id
       |  JOIN asg ca ON ca.vec_id = a.cand_id AND ca.bucket = qb.bucket
       |  WHERE a.cand_id <> a.query_id)
       |SELECT query_id, bucket, cand_id, adc_micro, CAST(rn AS INT) AS rn
       |FROM r WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin
  }

  /** x131's oracle: the x97 replay (kmeans buckets + PQ codebooks +
    * corpus codes), but the QUERIES are the element-wise means of stored
    * pairs (2i, 2i+1) — vectors the corpus does not contain — assigned to
    * their IVF cell against the replayed cent2 (the Spark side assigns
    * against the PERSISTED centroids; equality proves persisted ==
    * trained). The mean is one double add + exact halving per element,
    * bit-matching Spark's zip_with fold over double casts. No
    * self-exclusion: an unseen query owns none of the candidates. */
  private lazy val ivfPqServeSql: String = {
    s"""WITH $kmeansCtes,
       |sub AS MATERIALIZED (SELECT vec_id, s,
       |    list_slice(emb, s * 16 + 1, (s + 1) * 16) AS sub
       |  FROM e, UNNEST([0, 1, 2, 3]) AS t(s)),
       |cb0 AS MATERIALIZED (SELECT s, CAST(vec_id AS INT) AS c, sub AS cv
       |  FROM sub WHERE vec_id < 4),
       |${pqStepSql(0)},
       |${pqStepSql(1)},
       |codes AS MATERIALIZED (SELECT vec_id, s, c FROM (
       |    SELECT b.vec_id, b.s, cb.c, row_number() OVER (
       |        PARTITION BY b.vec_id, b.s
       |        ORDER BY round(${pqDistSql("b.sub", "cb.cv")}, 6), cb.c)
       |      AS rn
       |    FROM sub b JOIN cb2 cb ON cb.s = b.s) WHERE rn = 1),
       |qv AS MATERIALIZED (SELECT CAST(a.vec_id // 2 AS BIGINT)
       |      AS query_id,
       |    list_transform(range(1, 65),
       |      i -> (a.emb[i] + b.emb[i]) / 2) AS qemb
       |  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
       |  WHERE a.vec_id % 2 = 0 AND a.vec_id < 20),
       |qb AS (SELECT query_id, bucket FROM (
       |    SELECT q.query_id, c.centroid_id AS bucket, row_number() OVER (
       |        PARTITION BY q.query_id
       |        ORDER BY round(list_cosine_similarity(q.qemb, c.cv), 6) DESC,
       |                 c.centroid_id) AS rn
       |    FROM qv q, cent2 c) WHERE rn = 1),
       |qsub AS (SELECT query_id, s,
       |    list_slice(qemb, s * 16 + 1, (s + 1) * 16) AS sub
       |  FROM qv, UNNEST([0, 1, 2, 3]) AS t(s)),
       |lut AS MATERIALIZED (SELECT q.query_id, cb.s, cb.c,
       |    CAST(CAST(round(${pqDistSql("q.sub", "cb.cv")}, 6)
       |         AS DECIMAL(12,6)) * 1000000 AS BIGINT) AS cell
       |  FROM qsub q JOIN cb2 cb ON cb.s = q.s),
       |adc AS (SELECT l.query_id, c.vec_id AS cand_id,
       |    CAST(sum(l.cell) AS BIGINT) AS adc_micro
       |  FROM codes c JOIN lut l ON l.s = c.s AND l.c = c.c
       |  GROUP BY 1, 2),
       |r AS (SELECT a.query_id, qb.bucket, a.cand_id, a.adc_micro,
       |    row_number() OVER (PARTITION BY a.query_id
       |      ORDER BY a.adc_micro, a.cand_id) AS rn
       |  FROM adc a
       |  JOIN qb ON a.query_id = qb.query_id
       |  JOIN asg ca ON ca.vec_id = a.cand_id AND ca.bucket = qb.bucket)
       |SELECT query_id, bucket, cand_id, adc_micro, CAST(rn AS INT) AS rn
       |FROM r WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin
  }

  /** One Lloyd assignment CTE against `$cent`. */
  private def kmAsgSql(name: String, cent: String): String =
    s"""$name AS (SELECT vec_id, emb, centroid_id AS bucket FROM (
       |    SELECT e.vec_id, e.emb, c.centroid_id, row_number() OVER (
       |        PARTITION BY e.vec_id
       |        ORDER BY round(list_cosine_similarity(e.emb, c.cv), 6) DESC,
       |                 c.centroid_id) AS rn
       |    FROM e, $cent c) WHERE rn = 1)""".stripMargin

  /** One Lloyd step: assignment + DECIMAL-exact element-wise means. */
  private def kmStepSql(i: Int): String =
    s"""${kmAsgSql(s"asg$i", s"cent$i")},
       |m$i AS (SELECT bucket, pos,
       |    CAST(sum(CAST(val AS DECIMAL(38,15))) AS DOUBLE) / count(*) AS m
       |  FROM (SELECT bucket, unnest(emb) AS val,
       |          generate_subscripts(emb, 1) AS pos FROM asg$i)
       |  GROUP BY 1, 2),
       |cent${i + 1} AS (SELECT c.centroid_id, COALESCE(n.cv, c.cv) AS cv
       |  FROM cent$i c LEFT JOIN (SELECT bucket, list(m ORDER BY pos) AS cv
       |                           FROM m$i GROUP BY 1) n
       |    ON c.centroid_id = n.bucket)""".stripMargin

  /** The full k-means CTE chain (e → cent0 → 2 Lloyd steps → final `asg`)
    * shared by the x6 and x23 oracles. */
  private lazy val kmeansCtes: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |           FROM embeddings),
       |cent0 AS (SELECT vec_id AS centroid_id, emb AS cv
       |          FROM e WHERE vec_id < 8),
       |${kmStepSql(0)},
       |${kmStepSql(1)},
       |${kmAsgSql("asg", "cent2")}""".stripMargin

  /** The DYNAMIC-C k-means chain for x140: identical to [[kmeansCtes]]
    * except the centroid count is derived IN SQL from the same
    * C = max(8, ceil(√N / 6)) rule as
    * `Similarity.annCentroidCount` — sqrt/ceil are exactly-rounded
    * IEEE double ops, so the two engines compute the identical C and
    * the entry/oracle pair cannot drift when a fixture outgrows the
    * floor (round-16 ADVICE; every committed fixture still floors at
    * 8). */
  private lazy val kmeansCtesDyn: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |           FROM embeddings),
       |kp AS (SELECT GREATEST(8, CAST(ceil(sqrt(count(*)) / 6)
       |                              AS BIGINT)) AS k
       |       FROM e),
       |cent0 AS (SELECT vec_id AS centroid_id, emb AS cv
       |          FROM e WHERE vec_id < (SELECT k FROM kp)),
       |${kmStepSql(0)},
       |${kmStepSql(1)},
       |${kmAsgSql("asg", "cent2")}""".stripMargin

  /** The cluster-scoped kNN graph replay (sc -> nodes -> knn0 directed
    * edges) shared by the x95 pagerank and x133 label-prop oracles. */
  private lazy val knnGraphCtes: String =
    s"""sc AS MATERIALIZED (SELECT vec_id, emb, bucket FROM asg),
       |nodes AS MATERIALIZED (SELECT vec_id, bucket FROM sc),
       |knn0 AS (SELECT src, dst FROM (
       |    SELECT x.vec_id AS src, y.vec_id AS dst, row_number() OVER (
       |        PARTITION BY x.vec_id
       |        ORDER BY round(list_cosine_similarity(x.emb, y.emb), 6) DESC,
       |                 y.vec_id) AS rn
       |    FROM sc x JOIN sc y
       |      ON x.bucket = y.bucket AND x.vec_id <> y.vec_id)
       |  WHERE rn <= 4)""".stripMargin

  /** x133's oracle: the x95 graph replay, undirected + symmetrized, then
    * 4 generated MATERIALIZED synchronous LPA rounds — per round each
    * node adopts its neighbors' modal label (count DESC, label ASC ties;
    * isolated nodes keep their own). */
  private lazy val labelPropSql: String = {
    val rounds = 4
    val roundCtes = (1 to rounds).map { t =>
      s"""lab$t AS MATERIALIZED (SELECT n.vec_id,
         |    COALESCE(b.new_label, l.label) AS label
         |  FROM nodes n
         |  JOIN lab${t - 1} l USING (vec_id)
         |  LEFT JOIN (SELECT u AS vec_id, label AS new_label FROM (
         |      SELECT a.u, p.label, row_number() OVER (PARTITION BY a.u
         |          ORDER BY count(*) DESC, p.label) AS rn
         |      FROM adj a JOIN lab${t - 1} p ON p.vec_id = a.v
         |      GROUP BY a.u, p.label) WHERE rn = 1) b USING (vec_id))"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $kmeansCtes,
       |$knnGraphCtes,
       |und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
       |    GREATEST(src, dst) AS b FROM knn0),
       |adj AS MATERIALIZED (SELECT a AS u, b AS v FROM und
       |  UNION ALL SELECT b AS u, a AS v FROM und),
       |lab0 AS MATERIALIZED (SELECT vec_id, vec_id AS label FROM nodes),
       |$roundCtes
       |SELECT n.vec_id, n.bucket, CAST(l.label AS BIGINT) AS label
       |FROM nodes n JOIN lab$rounds l USING (vec_id)
       |ORDER BY n.vec_id""".stripMargin
  }

  /** x95's oracle: shared k-means replay -> cluster-scoped kNN edges ->
    * 6 generated MATERIALIZED integer pagerank rounds (each pr_t and the
    * edge table are multiply-referenced; DuckDB would otherwise inline
    * and re-evaluate the k-means per reference — the x75 lesson). */
  private lazy val pageRankSql: String = {
    val rounds = 6
    val roundCtes = (1 to rounds).map { t =>
      s"""pr$t AS MATERIALIZED (SELECT n.vec_id,
         |    CAST(150000000 + (85 * COALESCE(i.inbox, 0)) // 100 AS BIGINT)
         |      AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT k.dst AS vec_id, sum(p.pr // k.outdeg) AS inbox
         |    FROM knn k JOIN pr${t - 1} p ON k.src = p.vec_id
         |    GROUP BY 1) i USING (vec_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH $kmeansCtes,
       |$knnGraphCtes,
       |knn AS MATERIALIZED (SELECT k.src, k.dst, o.outdeg
       |  FROM knn0 k JOIN (SELECT src, count(*) AS outdeg
       |                    FROM knn0 GROUP BY 1) o USING (src)),
       |pr0 AS (SELECT vec_id, CAST(1000000000 AS BIGINT) AS pr FROM nodes),
       |$roundCtes,
       |deg AS (SELECT n.vec_id, n.bucket,
       |    CAST(COALESCE(od.outdeg, 0) AS BIGINT) AS outdeg,
       |    CAST(COALESCE(idg.indeg, 0) AS BIGINT) AS indeg
       |  FROM nodes n
       |  LEFT JOIN (SELECT src, count(*) AS outdeg FROM knn GROUP BY 1) od
       |    ON n.vec_id = od.src
       |  LEFT JOIN (SELECT dst, count(*) AS indeg FROM knn GROUP BY 1) idg
       |    ON n.vec_id = idg.dst),
       |fin AS (SELECT d.vec_id, d.bucket, d.outdeg, d.indeg,
       |    p.pr AS pr_nano,
       |    row_number() OVER (ORDER BY p.pr DESC, d.vec_id) AS rank
       |  FROM deg d JOIN pr$rounds p USING (vec_id))
       |SELECT CAST(rank AS INT) AS rank, vec_id, bucket, outdeg, indeg,
       |  pr_nano
       |FROM fin WHERE rank <= 20 ORDER BY rank""".stripMargin
  }

  /** Shared oracle prefix for the graph-analytics entries (x104/x105):
    * k-means replay → cluster-scoped kNN edges (the x95 knn0 form) →
    * canonical undirected edge set (a = min, b = max, DISTINCT). */
  private lazy val undKnnCtes: String =
    s"""$kmeansCtes,
       |sc AS MATERIALIZED (SELECT vec_id, emb, bucket FROM asg),
       |nodes AS MATERIALIZED (SELECT vec_id, bucket FROM sc),
       |knn0 AS (SELECT src, dst FROM (
       |    SELECT x.vec_id AS src, y.vec_id AS dst, row_number() OVER (
       |        PARTITION BY x.vec_id
       |        ORDER BY round(list_cosine_similarity(x.emb, y.emb), 6) DESC,
       |                 y.vec_id) AS rn
       |    FROM sc x JOIN sc y
       |      ON x.bucket = y.bucket AND x.vec_id <> y.vec_id)
       |  WHERE rn <= 4),
       |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
       |    greatest(src, dst) AS b FROM knn0)""".stripMargin

  /** x104's oracle: per-cluster node/edge/wedge/triangle counts and the
    * integer-ppm global clustering coefficient, all exact integers. */
  private lazy val triangleSql: String =
    s"""WITH $undKnnCtes,
       |deg AS (SELECT v, count(*) AS deg FROM (
       |    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) t
       |  GROUP BY 1),
       |wb AS (SELECT n.bucket,
       |    CAST(SUM(d.deg * (d.deg - 1) // 2) AS BIGINT) AS wedges
       |  FROM deg d JOIN nodes n ON d.v = n.vec_id GROUP BY 1),
       |tb AS (SELECT n.bucket, count(*) AS triangles
       |  FROM und e1
       |  JOIN und e2 ON e1.a = e2.a AND e2.b > e1.b
       |  JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
       |  JOIN nodes n ON e1.a = n.vec_id GROUP BY 1),
       |eb AS (SELECT n.bucket, count(*) AS n_edges
       |  FROM und u JOIN nodes n ON u.a = n.vec_id GROUP BY 1),
       |nb AS (SELECT bucket, count(*) AS n_nodes FROM nodes GROUP BY 1)
       |SELECT nb.bucket, nb.n_nodes,
       |  COALESCE(eb.n_edges, 0) AS n_edges,
       |  COALESCE(wb.wedges, 0) AS wedges,
       |  COALESCE(tb.triangles, 0) AS triangles,
       |  CASE WHEN COALESCE(wb.wedges, 0) > 0
       |       THEN (3000000 * COALESCE(tb.triangles, 0)) // wb.wedges
       |       ELSE 0 END AS closure_ppm
       |FROM nb LEFT JOIN eb USING (bucket) LEFT JOIN wb USING (bucket)
       |LEFT JOIN tb USING (bucket)
       |ORDER BY bucket""".stripMargin

  /** x120's oracle: the x13 threshold graph (6dp cosine >= 0.3,
    * DOUBLE[] casts), then 12 generated MATERIALIZED peel rounds
    * (alive_t = nodes with >= 3 alive neighbors in alive_{t-1}) — the
    * x95 fixed-round-contract shape. */
  private lazy val kCoreSql: String = {
    val rounds = 12
    val roundCtes = (1 to rounds).map { t =>
      s"""al$t AS MATERIALIZED (SELECT e.u AS vec_id
         |  FROM eboth e
         |  JOIN al${t - 1} x ON e.u = x.vec_id
         |  JOIN al${t - 1} y ON e.v = y.vec_id
         |  GROUP BY e.u HAVING count(*) >= 3)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |  FROM embeddings),
       |und AS MATERIALIZED (SELECT a.vec_id AS a, b.vec_id AS b
       |  FROM ev a JOIN ev b ON a.vec_id < b.vec_id
       |  WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= 0.3),
       |eboth AS MATERIALIZED (SELECT a AS u, b AS v FROM und
       |  UNION ALL SELECT b AS u, a AS v FROM und),
       |al0 AS MATERIALIZED (SELECT DISTINCT u AS vec_id FROM eboth),
       |$roundCtes,
       |cd AS (SELECT e.u AS vec_id, CAST(count(*) AS BIGINT) AS core_deg
       |  FROM eboth e
       |  JOIN al$rounds x ON e.u = x.vec_id
       |  JOIN al$rounds y ON e.v = y.vec_id
       |  GROUP BY e.u)
       |SELECT vec_id, core_deg FROM cd ORDER BY vec_id""".stripMargin
  }

  /** x105's oracle: hub-generated common-neighbor pairs, adjacency
    * anti-joined away, contributions 1e18 // ⌊ln(deg)·1e9⌋ — the same
    * integer freeze as the entry, summed exactly. */
  private lazy val adamicAdarSql: String =
    s"""WITH $undKnnCtes,
       |adj AS MATERIALIZED (SELECT a AS v, b AS n FROM und
       |  UNION ALL SELECT b AS v, a AS n FROM und),
       |lnn AS (SELECT v,
       |    CAST(floor(ln(CAST(count(*) AS DOUBLE)) * 1e9) AS BIGINT)
       |      AS ln_nano
       |  FROM adj GROUP BY 1),
       |cand AS (SELECT a1.n AS a, a2.n AS b, a1.v AS z
       |  FROM adj a1 JOIN adj a2 ON a1.v = a2.v AND a2.n > a1.n),
       |sc0 AS (SELECT c.a, c.b, count(*) AS cn,
       |    CAST(SUM(1000000000000000000 // l.ln_nano) AS BIGINT) AS aa_nano
       |  FROM cand c JOIN lnn l ON c.z = l.v GROUP BY 1, 2)
       |SELECT s.a, s.b, s.cn, s.aa_nano
       |FROM sc0 s LEFT JOIN und u ON s.a = u.a AND s.b = u.b
       |WHERE u.a IS NULL
       |ORDER BY s.aa_nano DESC, s.a, s.b LIMIT 30""".stripMargin

  /** x68's oracle: the same stored-centroid k-means replay, with the
    * appended segment and the queries BOTH assigned via the final cent2
    * table (exactly what "no k-means rerun" means), then one global
    * top-k over corpus ∪ segment. */
  private lazy val annIndexAppendSql: String =
    s"""WITH $kmeansCtes,
       |seg AS (SELECT vec_id + 1000000 AS vec_id, emb
       |        FROM e WHERE vec_id % 5 = 0),
       |sega AS (SELECT vec_id, emb, centroid_id AS bucket FROM (
       |    SELECT s.vec_id, s.emb, c.centroid_id, row_number() OVER (
       |        PARTITION BY s.vec_id
       |        ORDER BY round(list_cosine_similarity(s.emb, c.cv), 6) DESC,
       |                 c.centroid_id) AS rn
       |    FROM seg s, cent2 c) WHERE rn = 1),
       |q AS (SELECT vec_id + 2000000 AS query_id, emb AS qv,
       |             centroid_id AS bucket FROM (
       |    SELECT s.vec_id, s.emb, c.centroid_id, row_number() OVER (
       |        PARTITION BY s.vec_id
       |        ORDER BY round(list_cosine_similarity(s.emb, c.cv), 6) DESC,
       |                 c.centroid_id) AS rn
       |    FROM (SELECT vec_id, emb FROM e WHERE vec_id % 7 = 0) s, cent2 c)
       |    WHERE rn = 1),
       |allasg AS (SELECT vec_id, emb, bucket FROM asg
       |           UNION ALL SELECT vec_id, emb, bucket FROM sega),
       |scored AS (SELECT query_id, a.bucket, a.vec_id AS cand_id,
       |    round(list_cosine_similarity(qv, a.emb), 6) AS sim
       |  FROM allasg a JOIN q USING (bucket)),
       |r AS (SELECT *, row_number() OVER (
       |        PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rn
       |      FROM scored)
       |SELECT query_id, bucket, cand_id, sim, CAST(rn AS INT) AS rn
       |FROM r WHERE rn <= 3
       |ORDER BY query_id, rn""".stripMargin

  /** x69's oracle: the pinned x22 BM25 oracle embedded verbatim as the
    * lexical leg, the x5 cosine form as the vector leg, fused by
    * rank-only RRF — each term ONE double division, fixed add order. */
  private lazy val hybridRrfSql: String =
    s"""WITH lex AS (SELECT doc_id, rank AS r_lex
       |             FROM (${bm25OracleSql(Seq("spark", "query", "stream"), 20)
                              .replace("\n", "\n               ")}) t),
       |v AS (SELECT e.vec_id AS doc_id,
       |        round(${cosSql("q0.qv", "e.embedding")}, 6) AS sim
       |      FROM (SELECT embedding AS qv FROM embeddings
       |            WHERE vec_id = 0) q0,
       |           embeddings e WHERE e.vec_id <> 0),
       |vr AS (SELECT doc_id, CAST(row_number() OVER (
       |         ORDER BY sim DESC, doc_id) AS INT) AS r_vec FROM v),
       |vec AS (SELECT doc_id, r_vec FROM vr WHERE r_vec <= 20),
       |fused AS (SELECT COALESCE(l.doc_id, vec.doc_id) AS doc_id,
       |    l.r_lex, vec.r_vec,
       |    round(COALESCE(CAST(1 AS DOUBLE) / (60 + l.r_lex), 0)
       |        + COALESCE(CAST(1 AS DOUBLE) / (60 + vec.r_vec), 0), 6)
       |      AS rrf
       |  FROM lex l FULL OUTER JOIN vec ON l.doc_id = vec.doc_id),
       |rr AS (SELECT *, CAST(row_number() OVER (
       |         ORDER BY rrf DESC, doc_id) AS INT) AS rank FROM fused)
       |SELECT doc_id, r_lex, r_vec, rrf, rank FROM rr WHERE rank <= 10
       |ORDER BY rank""".stripMargin

  /** x143's oracle: the pinned BM25 oracle as the lexical leg and the
    * x69 cosine top-depth as the dense leg, each frozen to int64 micro
    * units, min-max normalized by positive-numerator floor division to
    * ppm, fused with integer weights 3/7 — every comparison integer. */
  private lazy val linearFusionSql: String =
    s"""WITH lexr AS (SELECT doc_id, score
       |              FROM (${bm25OracleSql(Seq("spark", "query", "stream"),
                               20).replace("\n", "\n               ")}) t),
       |lex AS (SELECT doc_id,
       |    CAST(CAST(score AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS s_lex
       |  FROM lexr),
       |v AS (SELECT e.vec_id AS doc_id,
       |        round(${cosSql("q0.qv", "e.embedding")}, 6) AS sim
       |      FROM (SELECT embedding AS qv FROM embeddings
       |            WHERE vec_id = 0) q0,
       |           embeddings e WHERE e.vec_id <> 0),
       |vt AS (SELECT doc_id,
       |    CAST(CAST(sim AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS s_vec
       |  FROM (SELECT *, row_number() OVER (ORDER BY sim DESC, doc_id)
       |          AS rn FROM v)
       |  WHERE rn <= 20),
       |mml AS (SELECT min(s_lex) AS mn, max(s_lex) AS mx FROM lex),
       |nl AS (SELECT doc_id, s_lex,
       |    CASE WHEN mx = mn THEN CAST(1000000 AS BIGINT)
       |         ELSE ((s_lex - mn) * 1000000) // (mx - mn) END
       |      AS n_lex_ppm
       |  FROM lex, mml),
       |mmv AS (SELECT min(s_vec) AS mn, max(s_vec) AS mx FROM vt),
       |nv AS (SELECT doc_id, s_vec,
       |    CASE WHEN mx = mn THEN CAST(1000000 AS BIGINT)
       |         ELSE ((s_vec - mn) * 1000000) // (mx - mn) END
       |      AS n_vec_ppm
       |  FROM vt, mmv),
       |fused AS (SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
       |    l.s_lex, v.s_vec, l.n_lex_ppm, v.n_vec_ppm,
       |    3 * COALESCE(l.n_lex_ppm, 0) + 7 * COALESCE(v.n_vec_ppm, 0)
       |      AS fused_scaled
       |  FROM nl l FULL OUTER JOIN nv v ON l.doc_id = v.doc_id),
       |r AS (SELECT *, CAST(row_number() OVER (
       |        ORDER BY fused_scaled DESC, doc_id) AS INT) AS rank
       |      FROM fused)
       |SELECT doc_id, s_lex, s_vec, n_lex_ppm, n_vec_ppm,
       |  CAST(fused_scaled AS BIGINT) AS fused_scaled, rank
       |FROM r WHERE rank <= 10
       |ORDER BY rank""".stripMargin

  /** x144's oracle: the WHOLE x143 oracle nested as the `linear` leg
    * (the retriever-tree composition is literal — a retriever's oracle
    * is a subquery of its parent's), the label-filtered dense top-20 as
    * the `knn(filter)` leg, fused by rank-only RRF exactly as x69. */
  private lazy val retrieverTreeSql: String =
    s"""WITH lin AS (SELECT doc_id, rank AS r_lin
       |             FROM (${linearFusionSql
                              .replace("\n", "\n               ")}) t),
       |fv AS (SELECT e.vec_id AS doc_id,
       |        round(${cosSql("q0.qv", "e.embedding")}, 6) AS sim
       |      FROM (SELECT embedding AS qv FROM embeddings
       |            WHERE vec_id = 0) q0,
       |           embeddings e
       |      WHERE e.vec_id <> 0 AND e.label IN (2, 5)),
       |fr AS (SELECT doc_id, CAST(row_number() OVER (
       |         ORDER BY sim DESC, doc_id) AS INT) AS r_fknn FROM fv),
       |fk AS (SELECT doc_id, r_fknn FROM fr WHERE r_fknn <= 20),
       |fused AS (SELECT COALESCE(l.doc_id, fk.doc_id) AS doc_id,
       |    l.r_lin, fk.r_fknn,
       |    round(COALESCE(CAST(1 AS DOUBLE) / (60 + l.r_lin), 0)
       |        + COALESCE(CAST(1 AS DOUBLE) / (60 + fk.r_fknn), 0), 6)
       |      AS rrf
       |  FROM lin l FULL OUTER JOIN fk ON l.doc_id = fk.doc_id),
       |r AS (SELECT *, CAST(row_number() OVER (
       |        ORDER BY rrf DESC, doc_id) AS INT) AS rank FROM fused)
       |SELECT doc_id, r_lin, r_fknn, rrf, rank FROM r WHERE rank <= 10
       |ORDER BY rank""".stripMargin

  /** x146's oracle: the WHOLE x144 oracle nested as the first stage
    * (retrievers nest — the x144 composition pattern), the top-5 window
    * left-joined to embeddings for the exact rescore (COALESCE 0 for a
    * page id with no vector), integer-weight combination (1·rrf_micro +
    * 1·resc_micro), within-window re-rank, untouched tail. */
  private lazy val rescorerSql: String =
    s"""WITH rt AS (SELECT doc_id, rrf, rank
       |            FROM (${retrieverTreeSql
                            .replace("\n", "\n             ")}) t),
       |q0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |w AS (SELECT r.doc_id, r.rank AS first_rank,
       |    COALESCE(CAST(CAST(round(${cosSql("q0.qv", "e.embedding")}, 6)
       |          AS DECIMAL(10,6)) * 1000000 AS BIGINT), 0) AS resc_micro,
       |    CAST(CAST(r.rrf AS DECIMAL(10,6)) * 1000000 AS BIGINT)
       |      AS rrf_micro
       |  FROM rt r
       |  LEFT JOIN embeddings e ON r.doc_id = e.vec_id
       |  CROSS JOIN q0
       |  WHERE r.rank <= 5),
       |c AS (SELECT doc_id, first_rank, resc_micro,
       |    1 * rrf_micro + 1 * resc_micro AS combined_scaled
       |  FROM w),
       |rw AS (SELECT doc_id, first_rank, resc_micro, combined_scaled,
       |    CAST(row_number() OVER (ORDER BY combined_scaled DESC, doc_id)
       |         AS INT) AS rank
       |  FROM c)
       |SELECT doc_id, first_rank, resc_micro, combined_scaled, rank
       |FROM rw
       |UNION ALL
       |SELECT doc_id, rank AS first_rank, CAST(NULL AS BIGINT),
       |  CAST(NULL AS BIGINT), rank
       |FROM rt WHERE rank > 5
       |ORDER BY rank""".stripMargin

  /** Query terms of the x22 BM25 fixture query (shared with its oracle). */
  private val Bm25Terms = Seq("spark", "query", "stream")

  /** DuckDB rendering of the ES-standard-analyzer token list — the exact
    * SQL contract documented on [[graft.functions.AnalyzeTokens]]:
    * lowercase, maximal alphanumeric runs, no empty tokens. */
  private def anTokSql(textExpr: String): String =
    s"list_filter(regexp_split_to_array(lower($textExpr), '[^a-z0-9]+')," +
      " t -> t <> '')"

  /** DuckDB rendering of the x22/x35 BM25 score — identical literals,
    * identical association order, integer tf/df inputs, so the double
    * arithmetic is bit-for-bit the Spark expression's. Tokenization is
    * the analyzed stream on BOTH sides; `source` lets x35 feed a
    * messified corpus through the same scoring SQL. */
  private def bm25OracleSql(terms: Seq[String], k: Int,
      source: String = "documents"): String = {
    val lower = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    val inList = lower.map(t => s"'$t'").mkString(", ")
    val tfCols = lower.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN term = '$t' THEN 1 ELSE 0 END) AS tf_$i" }.mkString(",\n    ")
    val dfCols = lower.zipWithIndex.map { case (t, i) =>
      s"count(DISTINCT CASE WHEN term = '$t' THEN doc_id END) AS df_$i" }
      .mkString(",\n    ")
    val termScore = terms.indices.map { i =>
      val tf = s"CAST(tf_$i AS DOUBLE)"
      val df = s"CAST(df_$i AS DOUBLE)"
      s"""(ln(1.0 + (n_docs - $df + 0.5) / ($df + 0.5))
         | * ($tf * 2.2)
         | / ($tf + 1.2 * (0.25 + 0.75 * CAST(len AS DOUBLE) / (sum_len / n_docs))))"""
        .stripMargin.replace("\n", " ")
    }.mkString("\n      + ")
    s"""WITH stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |    CAST(sum(len(${anTokSql("text")})) AS DOUBLE) AS sum_len
       |  FROM $source),
       |toks AS (SELECT doc_id, len(${anTokSql("text")}) AS len,
       |    unnest(${anTokSql("text")}) AS term
       |  FROM $source),
       |ft AS (SELECT doc_id, len,
       |    $tfCols
       |  FROM toks WHERE term IN ($inList) GROUP BY 1, 2),
       |dfs AS (SELECT
       |    $dfCols
       |  FROM toks WHERE term IN ($inList)),
       |scored AS (SELECT doc_id,
       |    round($termScore, 6) AS score
       |  FROM ft, dfs, stats),
       |r AS (SELECT doc_id, score, CAST(row_number() OVER (
       |        ORDER BY score DESC, doc_id) AS INT) AS rank
       |      FROM scored WHERE score > 0)
       |SELECT doc_id, score, rank FROM r WHERE rank <= $k
       |ORDER BY rank""".stripMargin
  }

  /** The x3 MinHash+LSH pair query (no final ORDER BY — reused as a CTE
    * by the x21 connected-components oracle). */
  /** The x2 exact n-gram Jaccard pair query (no final ORDER BY — reused
    * as the truth leg of the x86 dedup eval, over any corpus relation
    * and threshold). */
  private def ngramPairsSql(source: String = "documents",
      threshold: Double = 0.8): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM $source),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |         range(len(toks) - 2),
      |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS shingle FROM t),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |shared AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
      |           FROM sh a JOIN sh b
      |             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |           GROUP BY 1, 2),
      |j AS (SELECT d1, d2,
      |        round(shared / (s1.n + s2.n - shared), 6) AS jaccard
      |      FROM shared
      |      JOIN sizes s1 ON d1 = s1.doc_id
      |      JOIN sizes s2 ON d2 = s2.doc_id)
      |SELECT d1, d2, jaccard FROM j WHERE jaccard >= $threshold""".stripMargin

  private def minhashPairsSql(source: String = "documents"): String = {
    val mh = (0 until 12).map(k =>
      s"min(substr(md5('$k:' || tok), 1, 8)) AS mh$k").mkString(",\n  ")
    val bands = (0 until 4).map { b =>
      val key = (b * 3 until b * 3 + 3).map(k => s"mh$k").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
    }.mkString("\nUNION ALL ")
    val agree = (0 until 12)
      .map(k => s"CAST(s1.mh$k = s2.mh$k AS INT)").mkString(" + ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM $source),
       |toks AS (SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(len(toks) - 2),
       |    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS tok
       |  FROM t),
       |sig AS (SELECT doc_id,
       |  $mh
       |  FROM toks GROUP BY 1),
       |bands AS ($bands),
       |cand AS (SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
       |         FROM bands l JOIN bands r
       |           ON l.band = r.band AND l.band_key = r.band_key
       |              AND l.doc_id < r.doc_id),
       |est AS (SELECT d1, d2, round(($agree) / 12.0, 6) AS est_jaccard
       |        FROM cand
       |        JOIN sig s1 ON d1 = s1.doc_id
       |        JOIN sig s2 ON d2 = s2.doc_id)
       |SELECT d1, d2, est_jaccard FROM est WHERE est_jaccard >= 0.5""".stripMargin
  }

  /** x57's oracle: [[minhashPairsSql]]'s signature/banding replayed over
    * corpus + the planted new batch, with the candidate join STRICTLY
    * new×corpus. Same string band keys (the xxhash64-vs-string parity
    * note on the Spark side applies identically). */
  private lazy val incrementalDedupSql: String = incrementalSqlOver(
    """SELECT doc_id, text, FALSE AS is_new FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, TRUE FROM documents
      |  WHERE doc_id % 5 = 0""".stripMargin)

  /** x64's oracle: the same incremental shape with the corpus EXTENDED by
    * the appended batch-1 segment (ids +1e6) and the probe being batch-2
    * (every 7th doc, ids +2e6) — docs divisible by 35 must match both
    * their original and the appended copy. */
  private lazy val indexAppendSql: String = incrementalSqlOver(
    """SELECT doc_id, text, FALSE AS is_new FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, FALSE FROM documents
      |  WHERE doc_id % 5 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000, text, TRUE FROM documents
      |  WHERE doc_id % 7 = 0""".stripMargin)

  /** The x57 incremental-dedup oracle shape over a parameterized
    * corpus/batch CTE (`is_new` marks the probe side). */
  private def incrementalSqlOver(allDocs: String): String = {
    val mh = (0 until 12).map(k =>
      s"min(substr(md5('$k:' || tok), 1, 8)) AS mh$k").mkString(",\n  ")
    val bands = (0 until 4).map { b =>
      val key = (b * 3 until b * 3 + 3).map(k => s"mh$k").mkString(" || '|' || ")
      s"SELECT doc_id, is_new, $b AS band, $key AS band_key FROM sig"
    }.mkString("\nUNION ALL ")
    val agree = (0 until 12)
      .map(k => s"CAST(s1.mh$k = s2.mh$k AS INT)").mkString(" + ")
    s"""WITH all_docs AS (
       |  $allDocs),
       |t AS (SELECT doc_id, is_new, string_split(text, ' ') AS toks
       |      FROM all_docs),
       |toks AS (SELECT doc_id, is_new, unnest(list_distinct(list_transform(
       |    range(len(toks) - 2),
       |    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS tok
       |  FROM t),
       |sig AS (SELECT doc_id, is_new,
       |  $mh
       |  FROM toks GROUP BY 1, 2),
       |bands AS ($bands),
       |cand AS (SELECT DISTINCT l.doc_id AS new_id, r.doc_id AS corpus_id
       |         FROM bands l JOIN bands r
       |           ON l.band = r.band AND l.band_key = r.band_key
       |              AND l.is_new AND NOT r.is_new),
       |est AS (SELECT new_id, corpus_id,
       |          round(($agree) / 12.0, 6) AS est_jaccard
       |        FROM cand
       |        JOIN sig s1 ON new_id = s1.doc_id
       |        JOIN sig s2 ON corpus_id = s2.doc_id)
       |SELECT new_id, corpus_id, est_jaccard FROM est
       |WHERE est_jaccard >= 0.5
       |ORDER BY new_id, corpus_id""".stripMargin
  }

  /** x61/x63's shared oracle: x6's k-means + bucket probe unchanged (the
    * stored index changes where assignments come FROM, not their values). */
  private lazy val annIvfStoredSql: String =
    s"""WITH $kmeansCtes,
       |q AS (SELECT vec_id AS query_id, emb AS qv, bucket
       |      FROM asg WHERE vec_id < 10),
       |scored AS (SELECT query_id, a.bucket, a.vec_id AS cand_id,
       |    round(list_cosine_similarity(qv, a.emb), 6) AS sim
       |  FROM asg a JOIN q USING (bucket) WHERE a.vec_id <> q.query_id),
       |r AS (SELECT *, row_number() OVER (
       |        PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rn
       |      FROM scored)
       |SELECT query_id, bucket, cand_id, sim, CAST(rn AS INT) AS rn
       |FROM r WHERE rn <= 3
       |ORDER BY query_id, rn""".stripMargin

  /** x60's oracle: the pinned x58 / x3 / x47 / x51 / x55 / x52 CTE forms
    * chained over the SAME intermediate frames the Spark plan produces —
    * normalize feeds the minhash banding, survivors (pairs' larger ids
    * dropped) feed the decontamination excision, cleaned text feeds the
    * chunker, chunks feed the concat-packer at chunk_uid granularity, and
    * the packed stream feeds the epoch shuffle. Every scalar formula
    * (mess plant, minhash strings, span md5s, chars/4 estimate, '0x' hex
    * parse, order-key md5) is byte-identical to its standalone oracle, so
    * any divergence localizes to the stage that broke. */
  private lazy val curationPipelineSql: String = {
    val mh = (0 until 12).map(k =>
      s"min(substr(md5('$k:' || tok), 1, 8)) AS mh$k").mkString(",\n  ")
    val bands = (0 until 4).map { b =>
      val key = (b * 3 until b * 3 + 3).map(k => s"mh$k").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
    }.mkString("\nUNION ALL ")
    val agree = (0 until 12)
      .map(k => s"CAST(s1.mh$k = s2.mh$k AS INT)").mkString(" + ")
    s"""WITH norm AS (SELECT doc_id, source,
       |    trim(regexp_replace(lower(raw), '\\s+', ' ', 'g')) AS text
       |  FROM (SELECT doc_id, source,
       |      CASE WHEN doc_id % 4 = 0 THEN chr(9) || t || '   '
       |           ELSE t END AS raw
       |    FROM (SELECT doc_id, source,
       |        CASE WHEN doc_id % 3 = 0 THEN upper(replace(text, ' ', '  '))
       |             ELSE text END AS t
       |      FROM documents))),
       |nt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM norm),
       |mtoks AS (SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(len(toks) - 2),
       |    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS tok
       |  FROM nt),
       |sig AS (SELECT doc_id,
       |  $mh
       |  FROM mtoks GROUP BY 1),
       |bands AS ($bands),
       |cand AS (SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
       |         FROM bands l JOIN bands r
       |           ON l.band = r.band AND l.band_key = r.band_key
       |              AND l.doc_id < r.doc_id),
       |dup AS (SELECT DISTINCT d2 AS doc_id
       |        FROM cand
       |        JOIN sig s1 ON d1 = s1.doc_id
       |        JOIN sig s2 ON d2 = s2.doc_id
       |        WHERE round(($agree) / 12.0, 6) >= 0.5),
       |tr AS (SELECT doc_id, string_split(text, ' ') AS toks
       |       FROM norm
       |       WHERE source <> 'src9'
       |         AND doc_id NOT IN (SELECT doc_id FROM dup)),
       |sp AS (SELECT doc_id, CAST(i AS INT) AS start,
       |         md5(array_to_string(
       |           toks[CAST(i AS INT) : CAST(i + 7 AS INT)], ' ')) AS h
       |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
       |             FROM tr WHERE len(toks) >= 8)),
       |test AS (SELECT DISTINCT
       |           md5(array_to_string(
       |             toks[CAST(i AS INT) : CAST(i + 7 AS INT)], ' ')) AS h
       |         FROM (SELECT toks, unnest(range(1, len(toks) - 6)) AS i
       |               FROM nt JOIN norm USING (doc_id)
       |               WHERE source = 'src9' AND len(toks) >= 8)),
       |cov AS (SELECT DISTINCT doc_id, start + CAST(j AS INT) AS pos
       |        FROM (SELECT sp.doc_id, sp.start, unnest(range(8)) AS j
       |              FROM sp JOIN test USING (h))),
       |tp AS (SELECT doc_id, CAST(generate_subscripts(toks, 1) AS INT)
       |           AS pos, unnest(toks) AS tok
       |       FROM tr),
       |kept AS (SELECT tp.doc_id, tp.pos, tp.tok
       |         FROM tp LEFT JOIN cov
       |           ON tp.doc_id = cov.doc_id AND tp.pos = cov.pos
       |         WHERE cov.pos IS NULL),
       |cln AS (SELECT tr.doc_id, COALESCE(agg.cleaned, '') AS cleaned_text
       |        FROM tr LEFT JOIN (SELECT doc_id,
       |            string_agg(tok, ' ' ORDER BY pos) AS cleaned
       |          FROM kept GROUP BY 1) agg USING (doc_id)),
       |cd AS (SELECT doc_id, string_split(cleaned_text, ' ') AS toks
       |       FROM cln),
       |ch AS (SELECT doc_id, toks, len(toks) AS n,
       |         CAST(unnest(range(0, (len(toks) - 1) // 24 + 1)) AS INT)
       |           AS chunk_id
       |       FROM cd),
       |chunks AS (SELECT doc_id, chunk_id,
       |    CAST(least(32, n - chunk_id * 24) AS BIGINT) AS n_tokens,
       |    array_to_string(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')
       |      AS chunk_text
       |  FROM ch),
       |st AS (SELECT doc_id * 1000 + chunk_id AS chunk_uid, doc_id,
       |    chunk_id, n_tokens,
       |    CAST(ceil(length(chunk_text) / 4.0) AS BIGINT) AS est_tokens,
       |    CAST(('0x' || substr(md5(CAST(doc_id * 1000 + chunk_id
       |      AS VARCHAR)), 1, 2)) AS INT) % 8 AS shard
       |  FROM chunks),
       |pk AS (SELECT *, CAST(COALESCE(sum(est_tokens) OVER (
       |        PARTITION BY shard ORDER BY chunk_uid
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |        AS BIGINT) AS cum_before
       |      FROM st),
       |e AS (SELECT chunk_uid, doc_id, chunk_id, n_tokens, est_tokens,
       |        shard,
       |        CAST(cum_before // 2048 AS BIGINT) AS context_id,
       |        CAST(cum_before % 2048 AS BIGINT) AS offset_in_context,
       |        unnest(range(0, 2)) AS epoch
       |      FROM pk),
       |k AS (SELECT e.*, md5(CAST(chunk_uid AS VARCHAR) || ':' ||
       |        CAST(epoch AS VARCHAR)) AS order_key
       |      FROM e),
       |b AS (SELECT *, CAST(('0x' || substr(order_key, 1, 2)) AS INT) % 8
       |        AS batch_id
       |      FROM k)
       |SELECT CAST(epoch AS INT) AS epoch, batch_id,
       |  CAST(row_number() OVER (PARTITION BY epoch, batch_id
       |         ORDER BY order_key, chunk_uid) AS INT) AS pos,
       |  chunk_uid, doc_id, chunk_id, n_tokens, est_tokens, shard,
       |  context_id, offset_in_context
       |FROM b ORDER BY epoch, batch_id, pos""".stripMargin
  }

  /** In-order dot product of the DOUBLE[]-cast embedding with md5-derived
    * ±1 hyperplane `i` — the DuckDB rendering of the identical math inside
    * [[graft.functions.SignProjection]] (same hash rule, same fold order,
    * so the sign test can never diverge between engines). */
  private def lshDotSql(i: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(range(len(emb)), d ->
       |        CASE WHEN (('0x' || substr(md5('$i:' || CAST(d AS VARCHAR)), 1, 1))::INT % 2) = 1
       |             THEN emb[d+1] ELSE -emb[d+1] END)),
       |    (acc, x) -> acc + x)""".stripMargin

  /** Band value b of the sign-LSH signature: 8 sign bits packed little-
    * endian, mirroring SignProjection's `bands(i / bandBits) |= 1 << (i %
    * bandBits)`. */
  private def lshBandSql(b: Int, bandBits: Int): String =
    (0 until bandBits).map { j =>
      s"(CASE WHEN ${lshDotSql(b * bandBits + j)} > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

  val oracleSql: Map[String, String] = Map(
    "x1_dedup_exact" ->
      """WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
        |g AS (SELECT content_hash, min(doc_id) AS canonical_id,
        |             count(*) AS group_size FROM h GROUP BY 1)
        |SELECT doc_id, content_hash, canonical_id, group_size,
        |       doc_id = canonical_id AS is_canonical
        |FROM h JOIN g USING (content_hash) ORDER BY doc_id""".stripMargin,

    "x2_dedup_ngram" ->
      (ngramPairsSql() + "\nORDER BY d1, d2"),

    // x86: the corpus is AUGMENTED with deterministic partial copies
    // (first 2/3 of tokens, ids +2e6) so mid-range-Jaccard pairs exist
    // and the LSH banding genuinely loses some; both pair legs replay
    // their pinned forms over the augmented relation, then one
    // full-outer join + 1-row aggregate; ppm by null-guarded floor
    // division.
    "x86_dedup_eval" ->
      s"""WITH aug AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000 AS doc_id,
         |    array_to_string(toks[1:CAST(greatest((2 * len(toks)) // 3, 3)
         |      AS INT)], ' ') AS text
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
         |        FROM documents)
         |  WHERE doc_id % 3 = 0),
         |tr0 AS (${ngramPairsSql("aug", 0.5)}),
         |pr0 AS (${minhashPairsSql("aug")}),
         |tr AS (SELECT d1, d2, 1 AS t FROM tr0),
         |pr AS (SELECT d1, d2, 1 AS hit FROM pr0)
         |SELECT CAST(sum(COALESCE(t, 0)) AS BIGINT) AS n_truth,
         |  CAST(sum(COALESCE(hit, 0)) AS BIGINT) AS n_pred,
         |  CAST(sum(CASE WHEN t IS NOT NULL AND hit IS NOT NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |  CAST(COALESCE((sum(CASE WHEN t IS NOT NULL AND hit IS NOT NULL
         |    THEN 1 ELSE 0 END) * 1000000) // nullif(sum(COALESCE(hit, 0)),
         |    0), 0) AS BIGINT) AS precision_ppm,
         |  CAST(COALESCE((sum(CASE WHEN t IS NOT NULL AND hit IS NOT NULL
         |    THEN 1 ELSE 0 END) * 1000000) // nullif(sum(COALESCE(t, 0)),
         |    0), 0) AS BIGINT) AS recall_ppm
         |FROM tr FULL OUTER JOIN pr USING (d1, d2)""".stripMargin,

    "x3_dedup_minhash" -> (minhashPairsSql() + "\nORDER BY d1, d2"),

    // x57: x3's banding over corpus + planted batch (every 5th doc
    // re-ingested verbatim at id+1e6); candidates strictly new x corpus.
    "x57_incremental_dedup" -> incrementalDedupSql,

    // x59: identical result contract to x57 by construction (the persisted
    // index changes WHERE the corpus signatures come from, not their
    // values) — the oracle is shared.
    "x59_dedup_index_reuse" -> incrementalDedupSql,
    // x62: probe-only over the same stored index — same contract.
    "x62_dedup_index_probe" -> incrementalDedupSql,

    // x21: connected components over the x3 pair graph — the oracle closes
    // reachability with a recursive CTE and labels every doc with the min
    // reachable doc_id, exactly the fixpoint the Spark min-label
    // propagation converges to.
    "x21_dup_clusters" ->
      s"""WITH RECURSIVE pairs AS (
         |${minhashPairsSql()}),
         |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
         |          UNION ALL SELECT d2 AS src, d1 AS dst FROM pairs),
         |reach AS (
         |  SELECT doc_id AS d, doc_id AS r FROM documents
         |  UNION
         |  SELECT re.d, e.dst AS r FROM reach re JOIN edges e ON re.r = e.src),
         |lab AS (SELECT d AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
         |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
         |SELECT doc_id, cluster_id, cluster_size,
         |  doc_id = cluster_id AS is_canonical
         |FROM lab JOIN sz USING (cluster_id) ORDER BY doc_id""".stripMargin,

    // x26: large-star/small-star CC reaches the same fixpoint as x21's
    // label propagation — the oracle is the identical reachability closure
    "x26_dup_clusters_stars" ->
      s"""WITH RECURSIVE pairs AS (
         |${minhashPairsSql()}),
         |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
         |          UNION ALL SELECT d2 AS src, d1 AS dst FROM pairs),
         |reach AS (
         |  SELECT doc_id AS d, doc_id AS r FROM documents
         |  UNION
         |  SELECT re.d, e.dst AS r FROM reach re JOIN edges e ON re.r = e.src),
         |lab AS (SELECT d AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
         |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
         |SELECT doc_id, cluster_id, cluster_size,
         |  doc_id = cluster_id AS is_canonical
         |FROM lab JOIN sz USING (cluster_id) ORDER BY doc_id""".stripMargin,

    "x4_dedup_simhash" ->
      """WITH toks AS (SELECT doc_id,
        |  unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
        |th AS (SELECT doc_id,
        |  ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks),
        |bits AS (SELECT doc_id, b.bit, ((h >> bit) & 1) * 2 - 1 AS sgn
        |         FROM th, (SELECT unnest(range(32)) AS bit) b),
        |w AS (SELECT doc_id, bit, sum(sgn) AS w FROM bits GROUP BY 1, 2),
        |sig AS (SELECT doc_id,
        |  CAST(sum(CASE WHEN w > 0 THEN (1::BIGINT << bit) ELSE 0 END)
        |       AS BIGINT) AS simhash
        |  FROM w GROUP BY 1),
        |cl AS (SELECT simhash, count(*) AS cluster_size FROM sig GROUP BY 1)
        |SELECT doc_id, simhash, cluster_size FROM sig JOIN cl USING (simhash)
        |ORDER BY doc_id""".stripMargin,

    "x5_knn_brute" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < 10),
         |scored AS (SELECT query_id, e.vec_id AS cand_id,
         |    round(${cosSql("qv", "e.embedding")}, 6) AS sim
         |  FROM q, embeddings e WHERE e.vec_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (
         |        PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rn
         |      FROM scored)
         |SELECT query_id, cand_id, sim, CAST(rn AS INT) AS rn FROM r WHERE rn <= 5
         |ORDER BY query_id, rn""".stripMargin,

    // x50: x5's scored scan with the label inequality, labels carried
    // through the ranking.
    "x50_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
         |                  label AS q_label
         |           FROM embeddings WHERE vec_id < 10),
         |scored AS (SELECT query_id, q_label, e.vec_id AS cand_id,
         |    e.label AS c_label,
         |    round(${cosSql("qv", "e.embedding")}, 6) AS sim
         |  FROM q, embeddings e WHERE e.label <> q.q_label),
         |r AS (SELECT *, row_number() OVER (
         |        PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rn
         |      FROM scored)
         |SELECT query_id, q_label, cand_id, c_label, sim,
         |       CAST(rn AS INT) AS rn
         |FROM r WHERE rn <= 5
         |ORDER BY query_id, rn""".stripMargin,

    // x51: chunk starts replay as a range() unnest; DuckDB's inclusive
    // list slice toks[a:b] clamps at the tail exactly like Spark's
    // slice(toks, start, len).
    "x51_chunk" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |c AS (SELECT doc_id, toks, len(toks) AS n,
        |        CAST(unnest(range(0, (len(toks) - 1) // 24 + 1)) AS INT)
        |          AS chunk_id
        |      FROM d)
        |SELECT doc_id, chunk_id,
        |  CAST(least(32, n - chunk_id * 24) AS BIGINT) AS n_tokens,
        |  array_to_string(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')
        |    AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    // x52: md5 replays byte-for-byte; the first hex byte mod 8 is the
    // batch (256 % 8 = 0, exactly uniform); row_number needs the INT cast.
    "x52_epoch_shuffle" ->
      """WITH e AS (SELECT doc_id, unnest(range(0, 2)) AS epoch
        |           FROM documents),
        |k AS (SELECT doc_id, CAST(epoch AS INT) AS epoch,
        |        md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR))
        |          AS order_key
        |      FROM e),
        |b AS (SELECT *,
        |        CAST(list_reduce(list_transform(
        |            string_split(substr(order_key, 1, 2), ''),
        |            c -> instr('0123456789abcdef', c) - 1),
        |          (a, x) -> a * 16 + x) % 8 AS INT) AS batch_id
        |      FROM k)
        |SELECT epoch, batch_id,
        |       CAST(row_number() OVER (PARTITION BY epoch, batch_id
        |              ORDER BY order_key, doc_id) AS INT) AS pos,
        |       doc_id, order_key
        |FROM b ORDER BY epoch, batch_id, pos""".stripMargin,

    // x53: the planted PII replays verbatim; RE2 and Java regex agree on
    // these backtracking-free patterns; 'g' makes regexp_replace global
    // like Spark's.
    "x53_pii_redact" ->
      """WITH p AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 7 = 0
        |         THEN ' contact user' || CAST(doc_id AS VARCHAR) ||
        |              '@example.com for details' ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0
        |         THEN ' or call 555-' ||
        |              lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |         ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9]+@[a-z]+\.[a-z]+'))
        |       AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '555-[0-9]{4}')) AS BIGINT)
        |    AS n_phones,
        |  regexp_replace(regexp_replace(t, '[a-z0-9]+@[a-z]+\.[a-z]+',
        |      '[EMAIL]', 'g'), '555-[0-9]{4}', '[PHONE]', 'g') AS clean_text
        |FROM p ORDER BY doc_id""".stripMargin,

    // x54: same md5 rank, target = min per-stratum count via CTE.
    "x54_class_balance" ->
      """WITH sizes AS (SELECT source, count(*) AS cnt
        |              FROM documents GROUP BY 1),
        |t AS (SELECT min(cnt) AS target FROM sizes),
        |r AS (SELECT doc_id, source,
        |        md5(CAST(doc_id AS VARCHAR)) AS sample_key,
        |        CAST(row_number() OVER (PARTITION BY source
        |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |             AS INT) AS rn
        |      FROM documents)
        |SELECT doc_id, source, rn FROM r, t WHERE rn <= target
        |ORDER BY source, rn""".stripMargin,

    // x55: ceil -> DOUBLE in DuckDB (CAST to BIGINT); the running sum
    // excludes the current row (ROWS ... 1 PRECEDING), // floor-divides.
    "x55_concat_pack" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(ceil(len(text) / 4.0) AS BIGINT) AS est_tokens,
        |    CAST(list_reduce(list_transform(
        |        string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 2), ''),
        |        c -> instr('0123456789abcdef', c) - 1),
        |      (a, x) -> a * 16 + x) % 8 AS INT) AS shard
        |  FROM documents),
        |c AS (SELECT *, CAST(COALESCE(sum(est_tokens) OVER (
        |        PARTITION BY shard ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS cum_before
        |      FROM d)
        |SELECT shard, doc_id, est_tokens,
        |       CAST(cum_before // 2048 AS BIGINT) AS context_id,
        |       CAST(cum_before % 2048 AS BIGINT) AS offset_in_context
        |FROM c ORDER BY shard, doc_id""".stripMargin,

    // x56: identical association order for the interpolated probability,
    // 9dp-rounded ln DECIMAL-summed per doc (x22/x30 recipe); the
    // average stays in EXACT integer nano-nats — a rounded double avg
    // tied at the 6th decimal and the engines split the .5; positive
    // numerator so // and div agree.
    "x56_bigram_nll" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |bg AS (SELECT doc_id,
        |         toks[CAST(i AS INT)] AS w1,
        |         toks[CAST(i AS INT) + 1] AS w2
        |       FROM (SELECT doc_id, toks,
        |               unnest(range(1, len(toks))) AS i FROM d)),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM d),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |c2 AS (SELECT tok, count(*) AS c2 FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_total FROM tok),
        |per_doc AS (SELECT doc_id, w1, w2, count(*) AS m
        |            FROM bg GROUP BY 1, 2, 3),
        |scored AS (SELECT p.doc_id, p.m,
        |    CAST(CAST(round(ln(
        |        0.75 * (CAST(c12.c12 AS DOUBLE) / c1.c1)
        |      + 0.25 * (CAST(c2.c2 AS DOUBLE) / n.n_total)), 9)
        |      AS DECIMAL(20,9)) * 1000000000 AS BIGINT) * p.m
        |      AS contrib_nano
        |  FROM per_doc p
        |  JOIN c12 ON p.w1 = c12.w1 AND p.w2 = c12.w2
        |  JOIN c1 ON p.w1 = c1.w1
        |  JOIN c2 ON p.w2 = c2.tok, n)
        |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
        |  CAST(-sum(contrib_nano) AS BIGINT) AS nll_nano_sum,
        |  CAST(CAST(-sum(contrib_nano) AS BIGINT)
        |       // CAST(sum(m) AS BIGINT) AS BIGINT) AS avg_nll_nano
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // x58: the planted mess replays verbatim; 'g' makes regexp_replace
    // global like Spark's; trim strips ASCII spaces in both engines.
    "x58_normalize" ->
      """WITH m AS (SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0 THEN chr(9) || t || '   '
        |         ELSE t END AS raw
        |  FROM (SELECT doc_id,
        |      CASE WHEN doc_id % 3 = 0 THEN upper(replace(text, ' ', '  '))
        |           ELSE text END AS t
        |    FROM documents))
        |SELECT doc_id,
        |  trim(regexp_replace(lower(raw), '\s+', ' ', 'g')) AS normalized,
        |  raw <> trim(regexp_replace(lower(raw), '\s+', ' ', 'g'))
        |    AS changed
        |FROM m ORDER BY doc_id""".stripMargin,

    // x60: the composed pipeline oracle (see curationPipelineSql).
    "x60_pipeline" -> curationPipelineSql,

    // x6: the oracle replays the IDENTICAL 2-iteration Lloyd k-means —
    // seeds vec_id<8, argmax assignment on round(cos,6) with centroid-id
    // tiebreak, DECIMAL(38,15)-exact element-wise means cast to double —
    // then the same bucket-probe top-k. Every centroid, assignment and
    // score is reproduced bit-for-bit (decimal sums are order-independent,
    // double divides are IEEE on both engines).
    "x6_ann_ivf" ->
      s"""WITH $kmeansCtes,
         |q AS (SELECT vec_id AS query_id, emb AS qv, bucket
         |      FROM asg WHERE vec_id < 10),
         |scored AS (SELECT query_id, a.bucket, a.vec_id AS cand_id,
         |    round(list_cosine_similarity(qv, a.emb), 6) AS sim
         |  FROM asg a JOIN q USING (bucket) WHERE a.vec_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (
         |        PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rn
         |      FROM scored)
         |SELECT query_id, bucket, cand_id, sim, CAST(rn AS INT) AS rn
         |FROM r WHERE rn <= 3
         |ORDER BY query_id, rn""".stripMargin,

    // x85: every figure recomputes directly — counts/sums/floor
    // divisions; dup tally via the same md5-content groupBy; top token
    // by (n_occ DESC, token ASC).
    "x85_dataset_card" ->
      """WITH d AS (SELECT source, doc_id, text,
        |    string_split(text, ' ') AS toks FROM documents),
        |base AS (SELECT source, md5(text) AS h,
        |    CAST(len(toks) AS BIGINT) AS n_tok FROM d),
        |ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS token_sum,
        |    CAST(sum(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS short_docs
        |  FROM base GROUP BY 1),
        |dup AS (SELECT source, CAST(sum(c) AS BIGINT) AS dup_docs FROM (
        |    SELECT source, h, count(*) AS c FROM base GROUP BY 1, 2)
        |  WHERE c > 1 GROUP BY 1),
        |tok AS (SELECT source, unnest(toks) AS token FROM d),
        |tc AS (SELECT source, token, CAST(count(*) AS BIGINT) AS n_occ
        |  FROM tok GROUP BY 1, 2),
        |voc AS (SELECT source, CAST(count(*) AS BIGINT)
        |    AS distinct_tokens FROM tc GROUP BY 1),
        |top AS (SELECT source, token AS top_token,
        |    n_occ AS top_token_occ FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source
        |      ORDER BY n_occ DESC, token) AS rn FROM tc) WHERE rn = 1)
        |SELECT ps.source, ps.n_docs, ps.token_sum,
        |  CAST((ps.token_sum * 1000) // ps.n_docs AS BIGINT)
        |    AS mean_tokens_permille,
        |  ps.short_docs, CAST(COALESCE(dup.dup_docs, 0) AS BIGINT)
        |    AS dup_docs,
        |  voc.distinct_tokens, top.top_token, top.top_token_occ
        |FROM ps LEFT JOIN dup USING (source)
        |JOIN voc USING (source) JOIN top USING (source)
        |ORDER BY ps.source""".stripMargin,

    // x91: the same inverse-CDF Laplace from the same md5 uniform —
    // ln bit-identical, the 9dp nano freeze before any combination.
    "x91_dp_release" ->
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |u AS (SELECT source, n_docs,
        |    (('0x' || substr(md5('dp:' || source), 1, 8))::BIGINT + 0.5)
        |      / 4294967296.0 AS u
        |  FROM s),
        |n AS (SELECT source, n_docs,
        |    CAST(CAST(round(-1.0 * sign(u - 0.5)
        |        * ln(1.0 - 2.0 * abs(u - 0.5)), 9) AS DECIMAL(20,9))
        |      * 1000000000 AS BIGINT) AS noise_nano
        |  FROM u)
        |SELECT source, n_docs, noise_nano,
        |  n_docs * 1000000000 + noise_nano AS released_nano
        |FROM n ORDER BY source""".stripMargin,

    // x92: level-0 counts, failing groups re-aggregated at region
    // level, the same three-way verdict — all exact integers.
    "x92_k_anonymity" ->
      """WITH l0 AS (SELECT c_mktsegment, c_nationkey,
        |    CAST(count(*) AS BIGINT) AS n_custs
        |  FROM customer GROUP BY 1, 2),
        |j AS (SELECT l0.*, n.n_regionkey FROM l0
        |  JOIN nation n ON l0.c_nationkey = n.n_nationkey),
        |l1 AS (SELECT c_mktsegment, n_regionkey,
        |    CAST(sum(n_custs) AS BIGINT) AS n_region
        |  FROM j WHERE n_custs < 5 GROUP BY 1, 2)
        |SELECT j.c_mktsegment, j.c_nationkey, j.n_regionkey, j.n_custs,
        |  CASE WHEN j.n_custs >= 5 THEN 'nation'
        |       WHEN COALESCE(l1.n_region, 0) >= 5 THEN 'region'
        |       ELSE 'suppressed' END AS level,
        |  CASE WHEN j.n_custs >= 5 THEN j.n_custs
        |       WHEN COALESCE(l1.n_region, 0) >= 5 THEN l1.n_region
        |       ELSE 0 END AS released_size
        |FROM j LEFT JOIN l1
        |  ON j.c_mktsegment = l1.c_mktsegment
        | AND j.n_regionkey = l1.n_regionkey
        |ORDER BY j.c_mktsegment, j.c_nationkey""".stripMargin,

    // x84: the per-term BM25 legs replayed in long format (df = rows of
    // the tf table — equivalent to count distinct docs), judgments
    // rebuilt from tf; set metrics by floor division, DCG contributions
    // 6dp-rounded and DECIMAL-summed (ln bit-identical both engines).
    "x84_rank_eval" -> {
      val inList = Seq("spark", "query", "stream")
        .map(t => s"'$t'").mkString(", ")
      s"""WITH stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |    CAST(sum(len(${anTokSql("text")})) AS DOUBLE) AS sum_len
         |  FROM documents),
         |toks AS (SELECT doc_id, len(${anTokSql("text")}) AS len,
         |    unnest(${anTokSql("text")}) AS term
         |  FROM documents),
         |tf AS (SELECT term, doc_id, len, CAST(count(*) AS BIGINT) AS tf
         |  FROM toks WHERE term IN ($inList) GROUP BY 1, 2, 3),
         |dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
         |  FROM tf GROUP BY 1),
         |rel AS (SELECT term, CAST(count(*) AS BIGINT) AS n_relevant
         |  FROM tf WHERE tf >= 2 GROUP BY 1),
         |scored AS (SELECT t.term, t.doc_id, t.tf,
         |    round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         |      * (CAST(t.tf AS DOUBLE) * 2.2)
         |      / (CAST(t.tf AS DOUBLE) + 1.2 * (0.25
         |         + 0.75 * CAST(len AS DOUBLE) / (sum_len / n_docs))), 6)
         |      AS score
         |  FROM tf t JOIN dfs USING (term), stats),
         |top AS (SELECT * FROM (
         |    SELECT term, doc_id, tf, CAST(row_number() OVER (
         |      PARTITION BY term ORDER BY score DESC, doc_id) AS INT)
         |      AS pos
         |    FROM scored WHERE score > 0) WHERE pos <= 10),
         |en AS (SELECT term, pos,
         |    CASE WHEN tf >= 2 THEN 1 ELSE 0 END AS relevant,
         |    CASE WHEN least(tf, 3) = 1 THEN 1.0
         |         WHEN least(tf, 3) = 2 THEN 3.0 ELSE 7.0 END AS gain
         |  FROM top),
         |m AS (SELECT term, CAST(sum(relevant) AS BIGINT) AS n_rel_at_k,
         |    min(CASE WHEN relevant = 1 THEN pos END) AS frp,
         |    SUM(CAST(round(gain * ln(2) / ln(CAST(pos AS DOUBLE) + 1.0),
         |      6) AS DECIMAL(20,6))) AS dcg_sum
         |  FROM en GROUP BY 1)
         |SELECT m.term, r.n_relevant, m.n_rel_at_k,
         |  CAST((m.n_rel_at_k * 1000000) // 10 AS BIGINT)
         |    AS precision_ppm,
         |  CAST((m.n_rel_at_k * 1000000) // r.n_relevant AS BIGINT)
         |    AS recall_ppm,
         |  CAST(COALESCE(1000000 // frp, 0) AS BIGINT) AS mrr_ppm,
         |  CAST(dcg_sum AS DOUBLE) AS dcg
         |FROM m JOIN rel r USING (term) ORDER BY m.term""".stripMargin
    },

    // x83: both legs replayed from their pinned forms (x6's k-means +
    // bucket probe, x5's brute-force), then one left join + aggregate;
    // recall is exact integer ppm by floor division.
    "x83_ann_recall" ->
      s"""WITH $kmeansCtes,
         |iq AS (SELECT vec_id AS query_id, emb AS qv, bucket
         |       FROM asg WHERE vec_id < 10),
         |iscored AS (SELECT query_id, a.vec_id AS cand_id,
         |    round(list_cosine_similarity(qv, a.emb), 6) AS sim
         |  FROM asg a JOIN iq USING (bucket) WHERE a.vec_id <> iq.query_id),
         |ivf AS (SELECT query_id, cand_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, cand_id) AS rn FROM iscored)
         |  WHERE rn <= 5),
         |eq AS (SELECT vec_id AS query_id, embedding AS qv
         |       FROM embeddings WHERE vec_id < 10),
         |escored AS (SELECT query_id, e.vec_id AS cand_id,
         |    round(${cosSql("qv", "e.embedding")}, 6) AS sim
         |  FROM eq, embeddings e WHERE e.vec_id <> eq.query_id),
         |exact AS (SELECT query_id, cand_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, cand_id) AS rn FROM escored)
         |  WHERE rn <= 5)
         |SELECT x.query_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(sum(CASE WHEN i.cand_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hit,
         |  CAST((CAST(sum(CASE WHEN i.cand_id IS NOT NULL THEN 1 ELSE 0
         |    END) AS BIGINT) * 1000000) // count(*) AS BIGINT)
         |    AS recall_ppm
         |FROM exact x LEFT JOIN ivf i
         |  ON x.query_id = i.query_id AND x.cand_id = i.cand_id
         |GROUP BY x.query_id ORDER BY x.query_id""".stripMargin,

    // x90: the same k-means replay; the truth leg is the plain exact
    // all-pairs τ-join, split by bucket equality — counts + one floor
    // division, all exact integers.
    "x90_semdedup_eval" ->
      s"""WITH $kmeansCtes,
         |p AS (SELECT a.bucket AS b1, b.bucket AS b2
         |  FROM asg a JOIN asg b ON a.vec_id < b.vec_id
         |  WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= 0.35)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN b1 = b2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_within,
         |  CAST(sum(CASE WHEN b1 <> b2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_cross,
         |  CAST((sum(CASE WHEN b1 = b2 THEN 1 ELSE 0 END) * 1000000)
         |    // count(*) AS BIGINT) AS within_ppm
         |FROM p""".stripMargin,

    // x71: same k-means replay, then the SemDeDup dominance rule within
    // each cluster — a vector is pruned iff a same-cluster τ-neighbor
    // (round(cos,6) >= 0.35; the fixture vectors are near-random, max
    // within-cluster cosine ≈ 0.47, so τ is set where a real kept/pruned
    // mix exists) precedes it in (csim ASC, vec_id ASC); csim is the
    // vector's OWN rounded centroid cosine from the assignment.
    "x71_semdedup" ->
      s"""WITH $kmeansCtes,
         |sc AS (SELECT a.vec_id, a.bucket, a.emb,
         |    round(list_cosine_similarity(a.emb, c.cv), 6) AS csim
         |  FROM asg a JOIN cent2 c ON a.bucket = c.centroid_id),
         |pr AS (SELECT x.vec_id, x.csim, y.vec_id AS o_id, y.csim AS o_csim
         |  FROM sc x JOIN sc y
         |    ON x.bucket = y.bucket AND x.vec_id <> y.vec_id
         |   AND round(list_cosine_similarity(x.emb, y.emb), 6) >= 0.35),
         |ag AS (SELECT vec_id, count(*) AS n_dups,
         |    max(CASE WHEN o_csim < csim
         |             OR (o_csim = csim AND o_id < vec_id)
         |             THEN 1 ELSE 0 END) AS dominated
         |  FROM pr GROUP BY 1)
         |SELECT s.vec_id, s.bucket, s.csim,
         |  CAST(COALESCE(ag.n_dups, 0) AS BIGINT) AS n_dups,
         |  COALESCE(ag.dominated, 0) = 0 AS kept
         |FROM sc s LEFT JOIN ag USING (vec_id)
         |ORDER BY s.vec_id""".stripMargin,

    // x61/x63: identical result contract to x6 by construction (the
    // persisted index changes WHERE the assignments come from, not their
    // values) — the oracle replays x6's k-means + probe unchanged.
    "x61_ann_index_reuse" -> annIvfStoredSql,
    "x63_ann_index_probe" -> annIvfStoredSql,
    "x68_ann_index_append" -> annIndexAppendSql,
    "x69_hybrid_rrf" -> hybridRrfSql,
    "x143_linear_fusion" -> linearFusionSql,
    "x144_retriever_tree" -> retrieverTreeSql,
    // x64: the segment-append oracle (see indexAppendSql).
    "x64_dedup_index_append" -> indexAppendSql,

    // x88: probing the merged segment is contract-identical to x64's
    // per-segment union (disjoint corpus_id spaces) — same oracle.
    "x88_index_merge" -> indexAppendSql,

    // x93: the stream-built segments hold exactly the planted batch's
    // signatures, so the probe contract is x64's again — same oracle.
    "x93_stream_index_append" -> indexAppendSql,

    "x94_hll_cardinality" -> Sketches.hllOracle,

    // x95: the shared kmeans replay builds the same cluster-scoped kNN
    // graph, then 6 generated MATERIALIZED pagerank rounds (knn/od and
    // every pr_t are multiply-referenced — the x75 inlining lesson);
    // all-integer nano-unit arithmetic, `//` == `div` on positives.
    "x95_pagerank" -> pageRankSql,
    "x133_label_prop" -> labelPropSql,

    "x96_cms_topk" -> Sketches.cmsOracle,

    "x97_ivfpq_search" -> ivfPqSql,
    // x102: identical result contract to x97 by construction (the
    // persisted index changes WHERE codes come from, not their values)
    "x102_ivfpq_probe" -> ivfPqSql,
    "x131_ivfpq_serve" -> ivfPqServeSql,

    "x98_image_phash" -> Multimodal.imagePhashOracle,

    "x103_audio_fingerprint" -> Multimodal.audioFingerprintOracle,

    "x104_triangles" -> triangleSql,

    "x105_adamic_adar" -> adamicAdarSql,
    "x120_kcore" -> kCoreSql,

    // x107: identical per-source stage window + round-robin top-200
    "x107_curriculum" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS difficulty
        |  FROM documents),
        |s AS (SELECT *, row_number() OVER (PARTITION BY source
        |        ORDER BY difficulty, doc_id) AS stage FROM d),
        |t AS (SELECT * FROM s ORDER BY stage, source, doc_id LIMIT 200)
        |SELECT CAST(row_number() OVER (ORDER BY stage, source, doc_id)
        |         AS INT) AS position,
        |  doc_id, source, CAST(stage AS INT) AS stage, difficulty
        |FROM t ORDER BY position""".stripMargin,

    "x108_ddsketch" -> Sketches.ddSketchOracle,

    "x99_unigram_tokenize" -> Bpe.unigramOracle,

    // x137: the K EM rounds replayed as generated MATERIALIZED Viterbi
    // DP chains, one per round against that round's weight CTE.
    "x137_unigram_em" -> Bpe.unigramEmOracle(),

    // x142: the x137 training replay (shared emCtes) + an n-best DP
    // chain over the trained weights, top-3 per (word, position) under
    // the extension-invariant (score DESC, path ASC) total order.
    "x142_unigram_nbest" -> Bpe.unigramNbestOracle(),
    // x145: the x142 oracle nested whole as the n-best stage, then the
    // generate_series occurrence fan-out, the identical md5-Gumbel key
    // and the (key DESC, rank) argmax draw, re-aggregated per (word,
    // rank).
    "x145_unigram_sample" -> Bpe.unigramSampleOracle(),
    // x146: the x144 oracle nested whole as the first stage; exact
    // rescore over the top-5 window, COALESCE 0 for vectorless ids,
    // tail ranks pass through with NULL rescore columns.
    "x146_rescorer" -> rescorerSql,
    // x147: x137 training replay + one Viterbi chain under the trained
    // weights for per-word piece counts, the x7 lang rule per doc, and
    // exact-integer per-language re-aggregation (floor-divided micro
    // ratios, positive numerators).
    "x147_fertility" -> Bpe.fertilityOracle(),

    // x101: both field legs are the pinned x22 BM25 oracle over derived
    // field relations; best_fields fuses by greatest + doc_id tiebreak
    "x101_multi_match" -> {
      val titleRel = "(SELECT doc_id, array_to_string(list_slice(" +
        "string_split(text, ' '), 1, 5), ' ') AS text FROM documents)"
      val bodyRel = "(SELECT doc_id, array_to_string(list_slice(" +
        "string_split(text, ' '), 6, len(string_split(text, ' '))), ' ')" +
        " AS text FROM documents)"
      val terms = Seq("spark", "query", "stream")
      s"""WITH tleg AS (SELECT doc_id, score FROM (
         |  ${bm25OracleSql(terms, 1 << 20, titleRel)
               .replace("\n", "\n  ")}) x),
         |bleg AS (SELECT doc_id, score FROM (
         |  ${bm25OracleSql(terms, 1 << 20, bodyRel)
               .replace("\n", "\n  ")}) y),
         |f AS (SELECT COALESCE(t.doc_id, b.doc_id) AS doc_id,
         |    t.score AS title_score, b.score AS body_score,
         |    2 * greatest(
         |      COALESCE(CAST(CAST(t.score AS DECIMAL(10,6)) * 1000000
         |        AS BIGINT), 0),
         |      COALESCE(CAST(CAST(b.score AS DECIMAL(10,6)) * 1000000
         |        AS BIGINT), 0))
         |    + least(
         |      COALESCE(CAST(CAST(t.score AS DECIMAL(10,6)) * 1000000
         |        AS BIGINT), 0),
         |      COALESCE(CAST(CAST(b.score AS DECIMAL(10,6)) * 1000000
         |        AS BIGINT), 0)) AS score_hmicro
         |  FROM tleg t FULL OUTER JOIN bleg b ON t.doc_id = b.doc_id),
         |r AS (SELECT doc_id, title_score, body_score,
         |    CAST(score_hmicro AS BIGINT) AS score_hmicro,
         |    CAST(row_number() OVER (ORDER BY score_hmicro DESC, doc_id)
         |      AS INT) AS rank
         |  FROM f)
         |SELECT doc_id, title_score, body_score, score_hmicro, rank
         |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin
    },

    // x100: same micro-frozen sqrt weights and floor arithmetic; both
    // the capped and uncapped epoch legs are fixture-populated (probed)
    "x100_token_budget" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(sum(len(list_filter(string_split(text, ' '),
        |      x -> x <> ''))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |s AS (SELECT source, tokens,
        |    CAST(CAST(round(sqrt(CAST(tokens AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS sqrt_micro
        |  FROM t),
        |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
        |    CAST(sum(sqrt_micro) AS BIGINT) AS total_micro FROM s),
        |a AS (SELECT source, tokens, sqrt_micro,
        |    CAST((3 * total_tokens * sqrt_micro) // total_micro
        |      AS BIGINT) AS planned_tokens
        |  FROM s, tot),
        |e AS (SELECT source, tokens, sqrt_micro, planned_tokens,
        |    least((planned_tokens * 1000) // tokens, 3000)
        |      AS epochs_permille
        |  FROM a)
        |SELECT source, tokens, sqrt_micro, planned_tokens,
        |  CAST(epochs_permille AS BIGINT) AS epochs_permille,
        |  CAST((tokens * epochs_permille) // 1000 AS BIGINT)
        |    AS final_tokens
        |FROM e ORDER BY source""".stripMargin,

    // x23: same k-means + assignment, but each query probes its TOP-2
    // buckets (multi-probe recall knob); candidates unioned, exact top-k.
    "x23_ann_multiprobe" ->
      s"""WITH $kmeansCtes,
         |sims AS (SELECT e.vec_id AS query_id, e.emb AS qv, c.centroid_id,
         |    round(list_cosine_similarity(e.emb, c.cv), 6) AS csim
         |  FROM e, cent2 c WHERE e.vec_id < 10),
         |probes AS (SELECT query_id, qv, centroid_id AS bucket FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY csim DESC, centroid_id) AS prn FROM sims)
         |  WHERE prn <= 2),
         |scored AS (SELECT query_id, a.vec_id AS cand_id,
         |    round(list_cosine_similarity(qv, a.emb), 6) AS sim
         |  FROM asg a JOIN probes p ON a.bucket = p.bucket
         |  WHERE a.vec_id <> p.query_id),
         |r AS (SELECT *, row_number() OVER (
         |        PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rn
         |      FROM scored)
         |SELECT query_id, cand_id, sim, CAST(rn AS INT) AS rn
         |FROM r WHERE rn <= 3
         |ORDER BY query_id, rn""".stripMargin,

    "x7_langid" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |s AS (SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN tok IN ('the','a','of','and','to','in','is')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS en_hits,
        |  CAST(sum(CASE WHEN tok IN ('spark','table','query','join','batch',
        |                        'stream','vector','column')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS data_hits
        |  FROM toks GROUP BY 1)
        |SELECT doc_id,
        |  CASE WHEN en_hits >= data_hits THEN 'en' ELSE 'data' END AS pred_lang,
        |  en_hits, data_hits,
        |  round(greatest(en_hits, data_hits) / n_tokens, 6) AS confidence
        |FROM s ORDER BY doc_id""".stripMargin,

    "x8_quality" ->
      """SELECT doc_id, n_chars, n_tokens, n_types,
        |  round(n_types / n_tokens, 6) AS ttr,
        |  round((n_chars - n_tokens + 1) / n_tokens, 6) AS avg_tok_len,
        |  round(least(1.0, n_tokens / 100) * (n_types / n_tokens), 6) AS score
        |FROM (SELECT doc_id, length(text) AS n_chars,
        |        len(string_split(text, ' ')) AS n_tokens,
        |        len(list_distinct(string_split(text, ' '))) AS n_types
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // x70: per-token md5 → 32-bit hash (SimHash32's pinned '0x'||hex
    // recipe) → bucket mod 1024 → closed-form integer weight; list_sum
    // over every occurrence. All-integer — exact hash parity.
    "x70_quality_classifier" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |    t -> (('0x' || substr(md5(t), 1, 8))::BIGINT % 1024)
        |         * 131 % 997 - 498)) AS BIGINT) AS score,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |    t -> (('0x' || substr(md5(t), 1, 8))::BIGINT % 1024)
        |         * 131 % 997 - 498)) AS BIGINT) > 0 AS kept
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x9_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text,
        |      '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS bpe_ish_tokens,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_llm_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x15_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest(${anTokSql("text")}) AS term
        |              FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM
        |         (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (SELECT doc_id, tf.term, tf, df,
        |    round(tf * ln(CAST(n.n AS DOUBLE) / df), 6) AS score
        |  FROM tf JOIN df USING (term), n),
        |r AS (SELECT *, CAST(row_number() OVER (
        |        PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rk
        |      FROM scored)
        |SELECT doc_id, term, tf, df, score, rk FROM r WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,

    "x10_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
        |    (h, c) -> (h * 257 + c) % 1000000007) AS rolling_hash,
        |  list_min(list_transform(list_distinct(string_split(text, ' ')),
        |    t -> substr(md5(t), 1, 16))) AS min_token_hash
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x13_dedup_embed" ->
      s"""SELECT a.vec_id AS d1, b.vec_id AS d2,
         |  round(${cosSql("a.embedding", "b.embedding")}, 6) AS sim
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE round(${cosSql("a.embedding", "b.embedding")}, 6) >= 0.45
         |ORDER BY d1, d2""".stripMargin,

    // ascii corpus ⇒ byte slices == char slices, so the oracle frames the
    // text directly (DuckDB blob substring semantics differ)
    "x18_langid_ngram" -> {
      def occ(pats: Seq[String]): String = pats.map(p =>
        s"(length(text) - length(replace(text, '$p', ''))) / 2")
        .mkString(" + ")
      s"""SELECT doc_id,
         |  CAST(${occ(Seq("th", "he", "an", "re", "er"))} AS BIGINT) AS en_ngrams,
         |  CAST(${occ(Seq("qu", "rk", "ba", "ve", "jo"))} AS BIGINT) AS data_ngrams,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CASE WHEN ${occ(Seq("th", "he", "an", "re", "er"))} >=
         |            ${occ(Seq("qu", "rk", "ba", "ve", "jo"))}
         |       THEN 'en' ELSE 'data' END AS pred_lang,
         |  round((${occ(Seq("th", "he", "an", "re", "er"))} +
         |         ${occ(Seq("qu", "rk", "ba", "ve", "jo"))}) / length(text), 6)
         |    AS density
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "x16_anonymize" ->
      """SELECT event_id,
        |  sha256(CAST(user_id AS VARCHAR)) AS user_pseudonym,
        |  event_type,
        |  regexp_replace(props, '[0-9]', '#', 'g') AS props_redacted
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,

    "x17_mixture" ->
      """WITH b AS (SELECT doc_id, source,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT)
        |      AS bucket
        |  FROM documents)
        |SELECT doc_id, source, bucket FROM b
        |WHERE source = 'src0'
        |   OR (source = 'src1' AND bucket < 128)
        |   OR (source <> 'src0' AND source <> 'src1' AND bucket < 64)
        |ORDER BY doc_id""".stripMargin,

    // x19: same sig CTE as x4, then the Manku 4-block pigeonhole banding —
    // the oracle runs the identical block join + bit_count verify.
    "x19_simhash_pairs" ->
      """WITH toks AS (SELECT doc_id,
        |  unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
        |th AS (SELECT doc_id,
        |  ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks),
        |bits AS (SELECT doc_id, b.bit, ((h >> bit) & 1) * 2 - 1 AS sgn
        |         FROM th, (SELECT unnest(range(32)) AS bit) b),
        |w AS (SELECT doc_id, bit, sum(sgn) AS w FROM bits GROUP BY 1, 2),
        |sig AS (SELECT doc_id,
        |  CAST(sum(CASE WHEN w > 0 THEN (1::BIGINT << bit) ELSE 0 END)
        |       AS BIGINT) AS simhash
        |  FROM w GROUP BY 1),
        |blocks AS (SELECT doc_id, simhash, b.blk,
        |    (simhash >> (blk * 8)) & 255 AS blk_val
        |  FROM sig, (SELECT unnest(range(4)) AS blk) b),
        |cand AS (SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2,
        |    l.simhash AS s1, r.simhash AS s2
        |  FROM blocks l JOIN blocks r
        |    ON l.blk = r.blk AND l.blk_val = r.blk_val
        |       AND l.doc_id < r.doc_id)
        |SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(s1, s2)) <= 3
        |ORDER BY d1, d2""".stripMargin,

    // x129: identical shingle features (3-token windows, whole text
    // when < 3 tokens), 15-hex-char (60-bit) md5 fingerprint so BIGINT
    // never sees unsigned overflow, identical 4x15-bit pigeonhole.
    // Equal-signature pairs come out of the SAME candidate join here
    // (doc-level banding), matching the operator's signature-space
    // split of hamming-0 into the self-pairing leg.
    "x129_simhash64_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |         CASE WHEN len(toks) >= 3
        |           THEN list_transform(range(1, len(toks) - 1),
        |             i -> array_to_string(toks[i:i+2], ' '))
        |           ELSE [array_to_string(toks, ' ')] END)) AS s
        |       FROM t),
        |th AS (SELECT doc_id,
        |         ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh),
        |bits AS (SELECT doc_id, b.bt, ((h >> bt) & 1) * 2 - 1 AS sgn
        |         FROM th, (SELECT unnest(range(60)) AS bt) b),
        |w AS (SELECT doc_id, bt, sum(sgn) AS wt FROM bits GROUP BY 1, 2),
        |sig AS (SELECT doc_id,
        |  CAST(sum(CASE WHEN wt > 0 THEN (1::BIGINT << bt) ELSE 0 END)
        |       AS BIGINT) AS sh60
        |  FROM w GROUP BY 1),
        |blocks AS (SELECT doc_id, sh60, b.blk,
        |    (sh60 >> CAST(blk * 15 AS INT)) & 32767 AS blk_val
        |  FROM sig, (SELECT unnest(range(4)) AS blk) b),
        |cand AS (SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2,
        |    l.sh60 AS s1, r.sh60 AS s2
        |  FROM blocks l JOIN blocks r
        |    ON l.blk = r.blk AND l.blk_val = r.blk_val
        |       AND l.doc_id < r.doc_id)
        |SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(s1, s2)) <= 3
        |ORDER BY d1, d2""".stripMargin,

    // x20: the oracle implements the IDENTICAL sign-LSH — md5 hyperplanes,
    // in-order double fold, little-endian band packing — so the candidate
    // semantics (not just the verified cosines) are cross-engine checked.
    "x20_dedup_embed_lsh" -> {
      val bandCols = (0 until 8).map(b =>
        s"  ${lshBandSql(b, 8)} AS b$b").mkString(",\n")
      val bandUnion = (0 until 8).map(b =>
        s"SELECT vec_id, $b AS band, b$b AS band_val FROM sig")
        .mkString("\nUNION ALL ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |           FROM embeddings),
         |sig AS (SELECT vec_id,
         |$bandCols
         |  FROM e),
         |bands AS ($bandUnion),
         |cand AS (SELECT DISTINCT l.vec_id AS d1, r.vec_id AS d2
         |  FROM bands l JOIN bands r
         |    ON l.band = r.band AND l.band_val = r.band_val
         |       AND l.vec_id < r.vec_id)
         |SELECT d1, d2,
         |  round(${cosSql("a.emb", "b.emb")}, 6) AS sim
         |FROM cand JOIN e a ON d1 = a.vec_id JOIN e b ON d2 = b.vec_id
         |WHERE round(${cosSql("a.emb", "b.emb")}, 6) >= 0.45
         |ORDER BY d1, d2""".stripMargin
    },

    "x22_bm25_search" -> bm25OracleSql(Bm25Terms, 20),

    "x35_analyzed_search" -> bm25OracleSql(Seq("Spark", "QUERY", "Stream"),
      20, source =
        "(SELECT doc_id, upper(replace(text, ' ', ', ')) AS text FROM documents)"),

    // x36: identical A-ES math — md5-hex uniform (list_reduce hex parse),
    // ln(u)/w key, same 6dp rounds; top-k by (key DESC, doc_id)
    "x36_weighted_sample" ->
      """WITH q AS (SELECT doc_id,
        |    greatest(round(least(1.0, len(string_split(text, ' ')) / 100.0)
        |      * (len(list_distinct(string_split(text, ' ')))
        |         / CAST(len(string_split(text, ' ')) AS DOUBLE)), 6),
        |      0.001) AS w,
        |    list_reduce(list_transform(
        |        string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''),
        |        c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS h
        |  FROM documents),
        |keyed AS (SELECT doc_id, w,
        |    round(ln((h + 0.5) / 4294967296.0) / w, 6) AS key FROM q),
        |r AS (SELECT doc_id, w, "key", CAST(row_number() OVER (
        |        ORDER BY "key" DESC, doc_id) AS INT) AS "rank"
        |      FROM keyed)
        |SELECT doc_id, w, "key", "rank" FROM r WHERE "rank" <= 100
        |ORDER BY "rank"""".stripMargin,

    // x39: identical span cut + string rebuild — string_agg ORDER BY the
    // span index skips dropped spans, unspanned tail appended with the
    // same trim(body || ' ' || tail) construction; sum(int)->HUGEINT
    // cast back to BIGINT
    "x39_span_excise" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |    CAST(floor(len(string_split(text, ' ')) / 10) AS INT) AS nsp
        |  FROM documents),
        |s AS (SELECT doc_id, CAST(i AS INT) AS i,
        |    array_to_string(toks[(CAST(i AS INT)*10+1):(CAST(i AS INT)*10+10)], ' ')
        |      AS span_text
        |  FROM (SELECT doc_id, toks, unnest(range(nsp)) AS i FROM t)),
        |sd AS (SELECT md5(span_text) AS h, count(DISTINCT doc_id) AS span_docs
        |       FROM s GROUP BY 1),
        |k AS (SELECT s.doc_id,
        |    count(*) AS n_spans,
        |    CAST(sum(CASE WHEN span_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dropped,
        |    string_agg(CASE WHEN span_docs = 1 THEN span_text END,
        |               ' ' ORDER BY i) AS body
        |  FROM s JOIN sd ON md5(s.span_text) = sd.h GROUP BY 1)
        |SELECT t.doc_id,
        |  COALESCE(k.n_spans, 0) AS n_spans,
        |  COALESCE(k.n_dropped, 0) AS n_dropped,
        |  trim(COALESCE(k.body, '') || ' ' ||
        |       COALESCE(array_to_string(toks[(nsp*10+1):], ' '), ''))
        |    AS cleaned_text
        |FROM t LEFT JOIN k USING (doc_id) ORDER BY doc_id""".stripMargin,

    // x38: identical temperature-quota math — round(sqrt(n),6) DECIMAL
    // weights (order-free sum), ONE double division, md5 rank selection
    "x38_temperature_mixture" ->
      """WITH c AS (SELECT source, count(*) AS n_docs
        |           FROM documents GROUP BY 1),
        |w AS (SELECT source,
        |    CAST(round(sqrt(n_docs), 6) AS DECIMAL(18,6)) AS w FROM c),
        |t AS (SELECT CAST(sum(w) AS DECIMAL(18,6)) AS wt FROM w),
        |q AS (SELECT source, CAST(floor(300.0 *
        |        (CAST(w AS DOUBLE) / CAST(wt AS DOUBLE))) AS BIGINT)
        |        AS quota
        |      FROM w, t),
        |r AS (SELECT doc_id, source, CAST(row_number() OVER (
        |        PARTITION BY source
        |        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT)
        |        AS rk
        |      FROM documents)
        |SELECT r.doc_id, r.source, r.rk, q.quota
        |FROM r JOIN q USING (source)
        |WHERE rk <= quota ORDER BY source, rk""".stripMargin,

    // x132: the UniMax water-fill replayed as a recursive CTE over the
    // ascending language table (one state row per step: remaining budget
    // after each language's min(n·epochs, remaining // langs_left) grant);
    // all BIGINT floor divisions of non-negative numerators, selection is
    // x38's md5-rank window. Base CTEs MATERIALIZED (multi-referenced
    // from the recursive term — the x75 inlining lesson).
    "x132_unimax_mixture" ->
      """WITH RECURSIVE counts AS MATERIALIZED (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |ordered AS MATERIALIZED (
        |  SELECT lang, n_docs,
        |    CAST(row_number() OVER (ORDER BY n_docs, lang) AS BIGINT) AS i
        |  FROM counts),
        |k AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS k
        |                   FROM counts),
        |alloc AS (
        |  SELECT CAST(0 AS BIGINT) AS i,
        |    (SELECT CAST(sum(n_docs) * 80 // 100 AS BIGINT) FROM counts)
        |      AS remaining,
        |    CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS BIGINT) AS quota
        |  UNION ALL
        |  SELECT o.i,
        |    a.remaining - LEAST(o.n_docs * 1,
        |                        a.remaining // ((SELECT k FROM k) - a.i)),
        |    o.lang,
        |    LEAST(o.n_docs * 1,
        |          a.remaining // ((SELECT k FROM k) - a.i))
        |  FROM alloc a JOIN ordered o ON o.i = a.i + 1),
        |r AS (SELECT doc_id, lang, CAST(row_number() OVER (
        |        PARTITION BY lang
        |        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT)
        |        AS rk
        |      FROM documents)
        |SELECT r.doc_id, r.lang, r.rk, a.quota
        |FROM r JOIN alloc a ON a.lang = r.lang
        |WHERE r.rk <= a.quota ORDER BY r.lang, r.rk""".stripMargin,

    // x134: the Poisson-bootstrap replay — identical frozen thresholds
    // (TextAnalysis.bootWSql interpolates the same literals), identical
    // order-statistic ranks; sum(BIGINT)->HUGEINT cast back.
    "x134_bootstrap_ci" ->
      s"""WITH d AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS score
         |  FROM documents),
         |x AS (SELECT b, score,
         |    ('0x' || substr(md5('boot:' || b || ':' || doc_id), 1, 8))
         |      ::BIGINT AS u32
         |  FROM d, range(200) t(b)),
         |r AS (SELECT b, CAST(sum(${TextAnalysis.bootWSql}) AS BIGINT)
         |        AS sw,
         |      CAST(sum(${TextAnalysis.bootWSql} * score) AS BIGINT)
         |        AS sws
         |  FROM x GROUP BY 1),
         |m AS (SELECT b, (sws * 1000000) // sw AS rs_mean
         |      FROM r WHERE sw > 0),
         |rk AS (SELECT b, rs_mean, CAST(row_number() OVER (
         |        ORDER BY rs_mean, b) AS BIGINT) AS rn FROM m),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_resamples FROM m),
         |f AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST((sum(score) * 1000000) // count(*) AS BIGINT)
         |      AS mean_micro
         |  FROM d)
         |SELECT f.n_docs, nb.n_resamples, f.mean_micro,
         |  CAST(max(CASE WHEN rk.rn =
         |    (25 * (nb.n_resamples - 1)) // 1000 + 1
         |    THEN rk.rs_mean END) AS BIGINT) AS lo_micro,
         |  CAST(max(CASE WHEN rk.rn =
         |    (500 * (nb.n_resamples - 1)) // 1000 + 1
         |    THEN rk.rs_mean END) AS BIGINT) AS mid_micro,
         |  CAST(max(CASE WHEN rk.rn =
         |    (975 * (nb.n_resamples - 1)) // 1000 + 1
         |    THEN rk.rs_mean END) AS BIGINT) AS hi_micro
         |FROM rk, nb, f
         |GROUP BY f.n_docs, nb.n_resamples, f.mean_micro""".stripMargin,

    // x135: identical integer kappa form; `//` on a POSITIVE numerator
    // via the same sign-split CASE; len()/list_sum() cast to BIGINT.
    // Products compute in HUGEINT (mirroring Spark's DECIMAL(38,0)):
    // the cleared numerator is Theta(n^2 * 1e6) and overflows BIGINT
    // past ~3e6 docs — DuckDB BIGINT*BIGINT throws, it never promotes.
    "x135_filter_agreement" ->
      """WITH f AS (SELECT
        |    (len(string_split(text, ' ')) >= 20 AND
        |     len(list_distinct(string_split(text, ' '))) * 2 >=
        |       len(string_split(text, ' '))) AS a,
        |    (CAST(list_sum(list_transform(string_split(text, ' '),
        |       t -> (('0x' || substr(md5(t), 1, 8))::BIGINT % 1024)
        |            * 131 % 997 - 498)) AS BIGINT) > 0) AS b
        |  FROM documents),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS a_pos,
        |    CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS b_pos,
        |    CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_agree,
        |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS pos_agree
        |  FROM f)
        |SELECT n, a_pos, b_pos, n_agree, pos_agree,
        |  CAST(CASE
        |    WHEN (nh * n - sg) = 0 THEN 0
        |    WHEN (nh * n_agree - sg) * 1000000 >= 0
        |      THEN (nh * n_agree - sg) * 1000000 // (nh * n - sg)
        |    ELSE -((-((nh * n_agree - sg) * 1000000)) // (nh * n - sg))
        |  END AS BIGINT) AS kappa_ppm
        |FROM (SELECT *, CAST(n AS HUGEINT) AS nh,
        |        (CAST(a_pos AS HUGEINT) * b_pos
        |         + (CAST(n AS HUGEINT) - a_pos) * (n - b_pos)) AS sg
        |      FROM c)""".stripMargin,

    // x136: x72's derived snapshot-B + the x56 ln9 nano-nat recipe over
    // the union vocab; sum(BIGINT)->HUGEINT cast back.
    "x136_unigram_drift" -> {
      def ln9(x: String) =
        s"CAST(CAST(round(ln($x), 9) AS DECIMAL(20,9)) * 1000000000" +
          " AS BIGINT)"
      s"""WITH a AS (SELECT text FROM documents),
         |b AS (SELECT CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
         |             ELSE text END AS text
         |      FROM documents WHERE doc_id % 13 <> 0
         |      UNION ALL
         |      SELECT 'new ' || text FROM documents WHERE doc_id % 11 = 0),
         |ca AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM
         |        (SELECT unnest(string_split(text, ' ')) AS t FROM a)
         |       GROUP BY 1),
         |cb AS (SELECT t, CAST(count(*) AS BIGINT) AS d FROM
         |        (SELECT unnest(string_split(text, ' ')) AS t FROM b)
         |       GROUP BY 1),
         |j AS (SELECT COALESCE(ca.c, 0) AS c, COALESCE(cb.d, 0) AS d
         |      FROM ca FULL OUTER JOIN cb USING (t)),
         |s AS (SELECT CAST(sum(c) AS BIGINT) AS n_a,
         |        CAST(sum(d) AS BIGINT) AS n_b,
         |        CAST(count(*) AS BIGINT) AS v,
         |        CAST(sum((c + 1) * (${ln9("c + 1")} - ${ln9("d + 1")}))
         |             AS BIGINT) AS t_ab,
         |        CAST(sum((d + 1) * (${ln9("d + 1")} - ${ln9("c + 1")}))
         |             AS BIGINT) AS t_ba
         |      FROM j)
         |SELECT n_a AS n_tokens_a, n_b AS n_tokens_b, v AS vocab,
         |  CAST(t_ab + (n_a + v) * (${ln9("n_b + v")} - ${ln9("n_a + v")})
         |       AS BIGINT) AS kl_ab_scaled_nano,
         |  CAST(t_ba + (n_b + v) * (${ln9("n_a + v")} - ${ln9("n_b + v")})
         |       AS BIGINT) AS kl_ba_scaled_nano
         |FROM s""".stripMargin
    },

    // x37: DECIMAL-exact element-wise centroid means (the kmStepSql
    // contract) + list_cosine_similarity on DOUBLE[]
    "x37_embed_cohesion" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |m AS (SELECT label, pos,
        |    CAST(sum(CAST(val AS DECIMAL(38,15))) AS DOUBLE) / count(*) AS m
        |  FROM (SELECT label, unnest(emb) AS val,
        |          generate_subscripts(emb, 1) AS pos FROM e)
        |  GROUP BY 1, 2),
        |c AS (SELECT label, list(m ORDER BY pos) AS centroid
        |      FROM m GROUP BY 1)
        |SELECT vec_id, label,
        |  round(list_cosine_similarity(e.emb, c.centroid), 6) AS cohesion
        |FROM e JOIN c USING (label) ORDER BY vec_id""".stripMargin,

    "x29_significant_terms" ->
      s"""WITH toks AS (SELECT doc_id, source,
        |    unnest(list_distinct(${anTokSql("text")})) AS term
        |  FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS fg_docs
        |  FROM documents),
        |st AS (SELECT term, count(DISTINCT doc_id) AS bg_df,
        |    count(DISTINCT CASE WHEN source = 'src0' THEN doc_id END) AS fg_df
        |  FROM toks GROUP BY 1)
        |SELECT term, fg_df, bg_df,
        |  round((CAST(fg_df AS DOUBLE) / fg_docs)
        |        / (CAST(bg_df AS DOUBLE) / n_docs), 6) AS lift
        |FROM st, tot WHERE fg_df >= 5
        |ORDER BY lift DESC, term LIMIT 20""".stripMargin,

    // x30: DuckDB range(1, n) excludes n, matching Spark's
    // sequence(1, size-1) inclusive; sum(BIGINT)→HUGEINT cast back.
    "x30_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |g AS (SELECT doc_id,
        |        toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)]
        |          AS gram
        |      FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        |            FROM t)),
        |c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |  round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT), 6)
        |    AS top_gram_frac,
        |  round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
        |        / CAST(sum(c) AS BIGINT), 6) AS dup_gram_frac
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // x32: the oracle runs the NAIVE all-shingle self-join; the Spark
    // side's containment-adapted prefix filter is provably
    // output-identical (smaller-side prefix must collide).
    "x32_dedup_containment" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(len(toks) - 2),
        |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS shingle FROM t),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |shared AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
        |           FROM sh a JOIN sh b
        |             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2),
        |j AS (SELECT d1, d2,
        |        round(shared / least(s1.n, s2.n), 6) AS containment
        |      FROM shared
        |      JOIN sizes s1 ON d1 = s1.doc_id
        |      JOIN sizes s2 ON d2 = s2.doc_id)
        |SELECT d1, d2, containment FROM j WHERE containment >= 0.9
        |ORDER BY d1, d2""".stripMargin,

    // x34: reuses the recursive-CTE clustering (x21 oracle) + the x8
    // quality formula; scores are 6dp-rounded on both engines so the
    // DESC window ordering agrees bit-for-bit.
    "x34_keep_best" ->
      s"""WITH RECURSIVE pairs AS (
         |${minhashPairsSql()}),
         |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
         |          UNION ALL SELECT d2 AS src, d1 AS dst FROM pairs),
         |reach AS (
         |  SELECT doc_id AS d, doc_id AS r FROM documents
         |  UNION
         |  SELECT re.d, e.dst AS r FROM reach re JOIN edges e ON re.r = e.src),
         |lab AS (SELECT d AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
         |q AS (SELECT doc_id,
         |        round(least(1.0, len(string_split(text, ' ')) / 100)
         |              * (len(list_distinct(string_split(text, ' ')))
         |                 / len(string_split(text, ' '))), 6) AS score
         |      FROM documents)
         |SELECT cluster_id, cluster_size, kept_doc, kept_score,
         |  cluster_size - 1 AS n_dropped
         |FROM (SELECT cluster_id,
         |        CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
         |          AS cluster_size,
         |        doc_id AS kept_doc, score AS kept_score,
         |        row_number() OVER (PARTITION BY cluster_id
         |          ORDER BY score DESC, doc_id DESC) AS rn
         |      FROM lab JOIN q USING (doc_id))
         |WHERE rn = 1 ORDER BY cluster_id""".stripMargin,

    // x130: x34's recursive-CTE cluster labels, then x67's md5-fold
    // bucket recipe applied to the CLUSTER id (as VARCHAR, matching
    // Spark's cast-to-string md5 input).
    "x130_leakage_split" ->
      s"""WITH RECURSIVE pairs AS (
         |${minhashPairsSql()}),
         |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
         |          UNION ALL SELECT d2 AS src, d1 AS dst FROM pairs),
         |reach AS (
         |  SELECT doc_id AS d, doc_id AS r FROM documents
         |  UNION
         |  SELECT re.d, e.dst AS r FROM reach re JOIN edges e ON re.r = e.src),
         |lab AS (SELECT d AS doc_id, min(r) AS cluster_id
         |        FROM reach GROUP BY 1),
         |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT)
         |         AS cluster_size
         |       FROM lab GROUP BY 1),
         |b AS (SELECT lab.doc_id, lab.cluster_id, sz.cluster_size,
         |        CAST(list_reduce(list_transform(
         |          string_split(substr(
         |            md5(CAST(lab.cluster_id AS VARCHAR)), 1, 8), ''),
         |          c -> instr('0123456789abcdef', c) - 1),
         |          (a, b) -> a * 16 + b) % 1000 AS BIGINT) AS bucket
         |      FROM lab JOIN sz ON lab.cluster_id = sz.cluster_id)
         |SELECT doc_id, cluster_id, cluster_size, bucket,
         |  CASE WHEN bucket < 960 THEN 'train'
         |       WHEN bucket < 980 THEN 'val' ELSE 'test' END AS part
         |FROM b ORDER BY doc_id""".stripMargin,

    // x33: shingles are distinct per doc, so count(*) per shingle IS the
    // document frequency on both engines.
    "x33_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(len(toks) - 2),
        |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS shingle FROM t),
        |d AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unique,
        |  round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*), 6) AS novelty
        |FROM sh JOIN d USING (shingle)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // x31: DuckDB list slice toks[i : i+7] is 1-based inclusive (8
    // elements), matching Spark's slice(toks, i, 8); md5(varchar) ==
    // md5(binary(string)).
    "x31_contamination" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        |           FROM documents),
        |sp AS (SELECT doc_id, source,
        |         md5(array_to_string(
        |           toks[CAST(i AS INT) : CAST(i + 7 AS INT)], ' ')) AS h
        |       FROM (SELECT doc_id, source, toks,
        |               unnest(range(1, len(toks) - 6)) AS i
        |             FROM t WHERE len(toks) >= 8)),
        |test AS (SELECT DISTINCT h FROM sp WHERE source = 'src9')
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(sum(CASE WHEN test.h IS NOT NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_hit,
        |  round(CAST(sum(CASE WHEN test.h IS NOT NULL THEN 1 ELSE 0 END)
        |             AS DOUBLE) / count(*), 6) AS contamination
        |FROM sp LEFT JOIN test ON sp.h = test.h
        |WHERE sp.source <> 'src9'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // x106: the same span builder as x31; bit positions are the two md5
    // 32-bit halves (BIGINT-element hex fold) mod 2^20 in both engines
    "x106_bloom_decontaminate" -> {
      def hex8(start: Int): String =
        s"""list_reduce(list_transform(
           |        string_split(substr(h, $start, 8), ''),
           |        c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
           |      (a, b) -> a * 16 + b) % 1048576""".stripMargin
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
         |           FROM documents),
         |sp AS (SELECT doc_id, source,
         |         md5(array_to_string(
         |           toks[CAST(i AS INT) : CAST(i + 7 AS INT)], ' ')) AS h
         |       FROM (SELECT doc_id, source, toks,
         |               unnest(range(1, len(toks) - 6)) AS i
         |             FROM t WHERE len(toks) >= 8)),
         |test AS MATERIALIZED (SELECT DISTINCT h FROM sp
         |                      WHERE source = 'src9'),
         |tp AS (SELECT h, ${hex8(1)} AS p1, ${hex8(9)} AS p2 FROM test),
         |bits AS MATERIALIZED (SELECT DISTINCT p FROM (
         |    SELECT p1 AS p FROM tp UNION ALL SELECT p2 FROM tp) u),
         |probe AS (SELECT DISTINCT doc_id, h FROM sp
         |          WHERE source <> 'src9'),
         |pp AS (SELECT doc_id, h, ${hex8(1)} AS p1, ${hex8(9)} AS p2
         |       FROM probe)
         |SELECT doc_id, count(*) AS n_spans,
         |  CAST(sum(CASE WHEN b1.p IS NOT NULL AND b2.p IS NOT NULL
         |                THEN 1 ELSE 0 END) AS BIGINT) AS bloom_hits,
         |  CAST(sum(CASE WHEN test.h IS NOT NULL THEN 1 ELSE 0 END)
         |       AS BIGINT) AS exact_hits,
         |  CAST(sum(CASE WHEN b1.p IS NOT NULL AND b2.p IS NOT NULL
         |                THEN 1 ELSE 0 END) -
         |       sum(CASE WHEN test.h IS NOT NULL THEN 1 ELSE 0 END)
         |       AS BIGINT) AS false_positives
         |FROM pp
         |LEFT JOIN bits b1 ON pp.p1 = b1.p
         |LEFT JOIN bits b2 ON pp.p2 = b2.p
         |LEFT JOIN test ON pp.h = test.h
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // x109: identical sliding grams, dup filter, interval-merge windows
    // and ordered rebuild; DuckDB's 1-based inclusive list slice mirrors
    // Spark's slice(toks, s+1, k). Docs with every token excised get ''
    // via the COALESCE (their rebuild group is empty).
    "x109_exact_substr" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |b AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens
        |      FROM t),
        |g AS (SELECT doc_id, s,
        |        md5(array_to_string(
        |          toks[CAST(s + 1 AS INT) : CAST(s + 12 AS INT)], ' ')) AS h
        |      FROM (SELECT doc_id, toks,
        |              unnest(range(CASE WHEN len(toks) >= 12
        |                                THEN CAST(len(toks) - 11 AS BIGINT)
        |                                ELSE 0 END)) AS s
        |            FROM b)),
        |d AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
        |st AS (SELECT doc_id, s FROM g JOIN d USING (h)),
        |i0 AS (SELECT doc_id, s,
        |         max(s + 12) OVER (PARTITION BY doc_id ORDER BY s
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |       FROM st),
        |i1 AS (SELECT doc_id, s,
        |         sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY s
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS island
        |       FROM i0),
        |iv AS (SELECT doc_id, island, min(s) AS i_s, max(s + 12) AS i_e
        |       FROM i1 GROUP BY 1, 2),
        |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_islands,
        |         CAST(sum(i_e - i_s) AS BIGINT) AS dup_tokens
        |       FROM iv GROUP BY 1),
        |pos AS (SELECT doc_id, s AS p, toks[CAST(s + 1 AS INT)] AS tok
        |        FROM (SELECT doc_id, toks,
        |                unnest(range(CAST(len(toks) AS BIGINT))) AS s
        |              FROM b)),
        |kept AS (SELECT pos.doc_id, pos.p, pos.tok
        |         FROM pos LEFT JOIN iv ON pos.doc_id = iv.doc_id
        |           AND pos.p >= iv.i_s AND pos.p < iv.i_e
        |         WHERE iv.island IS NULL),
        |rec AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS kept_text
        |        FROM kept GROUP BY doc_id)
        |SELECT b.doc_id, b.n_tokens,
        |  CAST(COALESCE(pd.n_islands, 0) AS BIGINT) AS n_islands,
        |  CAST(COALESCE(pd.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |  COALESCE(rec.kept_text, '') AS kept_text
        |FROM b LEFT JOIN pd USING (doc_id)
        |LEFT JOIN rec ON b.doc_id = rec.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    // x110: same per-doc scalars, bigram top-count, and the x109
    // interval-merge windows at gram length 3 (doc-scoped duplicates);
    // every metric an exact integer, keep a BOOLEAN of integer gates.
    "x110_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |           FROM documents),
        |b AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_words,
        |        CAST(length(text) AS BIGINT)
        |          - (CAST(len(toks) AS BIGINT) - 1) AS char_sum,
        |        CAST(len(list_filter(toks, x -> x IN
        |          ('the','a','of','and','to','in','is'))) AS BIGINT)
        |          AS stop_n
        |      FROM t),
        |g2 AS (SELECT doc_id,
        |         toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)]
        |           AS gram
        |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        |             FROM t)),
        |c2 AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_c,
        |         CAST(sum(c) AS BIGINT) AS n_grams
        |       FROM (SELECT doc_id, gram, count(*) AS c FROM g2
        |             GROUP BY 1, 2) GROUP BY 1),
        |g3 AS (SELECT doc_id, s,
        |         md5(array_to_string(
        |           toks[CAST(s + 1 AS INT) : CAST(s + 3 AS INT)], ' ')) AS h
        |       FROM (SELECT doc_id, toks,
        |               unnest(range(CASE WHEN len(toks) >= 3
        |                                 THEN CAST(len(toks) - 2 AS BIGINT)
        |                                 ELSE 0 END)) AS s
        |             FROM t)),
        |d3 AS (SELECT doc_id, s FROM (
        |         SELECT doc_id, s,
        |           count(*) OVER (PARTITION BY doc_id, h) AS occ
        |         FROM g3) WHERE occ >= 2),
        |i0 AS (SELECT doc_id, s,
        |         max(s + 3) OVER (PARTITION BY doc_id ORDER BY s
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |       FROM d3),
        |i1 AS (SELECT doc_id, s,
        |         sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY s
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS island
        |       FROM i0),
        |cov AS (SELECT doc_id, CAST(sum(i_e - i_s) AS BIGINT)
        |          AS dup3_tokens
        |        FROM (SELECT doc_id, island, min(s) AS i_s,
        |                max(s + 3) AS i_e
        |              FROM i1 GROUP BY 1, 2) GROUP BY 1),
        |m AS (SELECT b.doc_id, b.n_words,
        |        (b.char_sum * 1000) // b.n_words AS mean_wlen_milli,
        |        b.stop_n,
        |        CASE WHEN c2.n_grams > 0
        |             THEN (c2.top_c * 1000000) // c2.n_grams
        |             ELSE 0 END AS top2_ppm,
        |        (COALESCE(cov.dup3_tokens, 0) * 1000000) // b.n_words
        |          AS dup3_ppm
        |      FROM b LEFT JOIN c2 USING (doc_id)
        |      LEFT JOIN cov USING (doc_id))
        |SELECT doc_id, n_words, mean_wlen_milli, stop_n, top2_ppm,
        |  dup3_ppm,
        |  n_words BETWEEN 30 AND 100000
        |    AND mean_wlen_milli BETWEEN 3000 AND 10000
        |    AND stop_n >= 2 AND top2_ppm <= 200000
        |    AND dup3_ppm <= 180000 AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    // x111: the md5 15-hex fold, direct k-min windows (the Spark side's
    // salted two-phase is output-identical), HUGEINT // for the scaled
    // estimates.
    "x111_kmv_theta" -> Sketches.kmvThetaOracle,

    // x112: the x37 centroid/cohesion SQL verbatim + the x55 packing
    // windows keyed by (cohesion DESC, vec_id).
    "x112_semantic_pack" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |m AS (SELECT label, pos,
        |    CAST(sum(CAST(val AS DECIMAL(38,15))) AS DOUBLE) / count(*) AS m
        |  FROM (SELECT label, unnest(emb) AS val,
        |          generate_subscripts(emb, 1) AS pos FROM e)
        |  GROUP BY 1, 2),
        |c AS (SELECT label, list(m ORDER BY pos) AS centroid
        |      FROM m GROUP BY 1),
        |coh AS (SELECT vec_id, label,
        |    round(list_cosine_similarity(e.emb, c.centroid), 6) AS cohesion
        |  FROM e JOIN c USING (label)),
        |d AS (SELECT doc_id AS vec_id,
        |        CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
        |      FROM documents),
        |j AS (SELECT coh.label, coh.vec_id, coh.cohesion, d.est_tokens,
        |        COALESCE(CAST(sum(est_tokens) OVER (
        |          PARTITION BY label ORDER BY cohesion DESC, coh.vec_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          AS BIGINT), 0) AS cum_before
        |      FROM coh JOIN d USING (vec_id))
        |SELECT label, cum_before // 512 AS context_id, vec_id, cohesion,
        |  est_tokens, cum_before % 512 AS offset_in_context
        |FROM j ORDER BY label, context_id, offset_in_context""".stripMargin,

    // x113: list_cosine_similarity on DOUBLE[] (the x37 contract), one
    // (anchor, same?) rank window, micro-int margin per the x101 rule
    "x113_triplet_mining" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |q AS (SELECT vec_id AS anchor_id, label AS a_label, emb AS qv
        |      FROM e WHERE vec_id < 50),
        |sc AS (SELECT q.anchor_id, q.a_label, c.vec_id AS cand_id,
        |         c.label AS c_label,
        |         round(list_cosine_similarity(q.qv, c.emb), 6) AS sim,
        |         c.label = q.a_label AS same
        |       FROM e c, q WHERE c.vec_id <> q.anchor_id),
        |top AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY anchor_id, same
        |      ORDER BY sim DESC, cand_id) AS rn
        |    FROM sc) WHERE rn = 1),
        |pos AS (SELECT anchor_id, a_label, cand_id AS pos_id,
        |          sim AS pos_sim
        |        FROM top WHERE same),
        |neg AS (SELECT anchor_id, cand_id AS neg_id, c_label AS neg_label,
        |          sim AS neg_sim
        |        FROM top WHERE NOT same)
        |SELECT p.anchor_id, p.a_label, p.pos_id, p.pos_sim, n.neg_id,
        |  n.neg_label, n.neg_sim,
        |  CAST(CAST(pos_sim AS DECIMAL(10,6)) * 1000000 AS BIGINT)
        |    - CAST(CAST(neg_sim AS DECIMAL(10,6)) * 1000000 AS BIGINT)
        |    AS margin_micro
        |FROM pos p JOIN neg n USING (anchor_id)
        |ORDER BY anchor_id""".stripMargin,

    // x114: the x37 decimal centroid means; distances fold with
    // list_reduce in Spark's exact left-to-right association (0 + x1
    // == x1, so the no-init fold matches); signed micro-sum, so no
    // floor division of a possibly-negative quantity anywhere
    "x114_silhouette" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |m AS (SELECT label, pos,
        |    CAST(sum(CAST(val AS DECIMAL(38,15))) AS DOUBLE) / count(*) AS m
        |  FROM (SELECT label, unnest(emb) AS val,
        |          generate_subscripts(emb, 1) AS pos FROM e)
        |  GROUP BY 1, 2),
        |c AS (SELECT label AS c_label, list(m ORDER BY pos) AS centroid
        |      FROM m GROUP BY 1),
        |d AS (SELECT vec_id, label, c_label,
        |    sqrt(list_reduce(list_transform(
        |      generate_series(1, len(emb)),
        |      i -> (emb[i] - centroid[i]) * (emb[i] - centroid[i])),
        |      (a, b) -> a + b)) AS dist
        |  FROM e, c),
        |ab AS (SELECT vec_id, label,
        |    min(CASE WHEN c_label = label THEN dist END) AS a,
        |    min(CASE WHEN c_label <> label THEN dist END) AS b
        |  FROM d GROUP BY 1, 2),
        |s AS (SELECT vec_id, label,
        |        round((b - a) / greatest(a, b), 6) AS sil
        |      FROM ab)
        |SELECT label, count(*) AS n,
        |  CAST(sum(CAST(CAST(sil AS DECIMAL(10,6)) * 1000000 AS BIGINT))
        |       AS BIGINT) AS sum_sil_micro,
        |  min(sil) AS min_sil, max(sil) AS max_sil
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    // x115: len() counts chars like Spark's length(); integer sums and
    // a positive floor-div (// floors, div truncates — same on >= 0)
    "x115_tokenizer_fertility" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text,
        |      '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS chars,
        |  CAST(sum(len(regexp_extract_all(text,
        |      '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) * 10000
        |    // CAST(sum(length(text)) AS BIGINT) AS tok_per_10k_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // x116: same greatest(t,1) floor keeps every floor-div numerator
    // non-negative (Spark div truncates, DuckDB // floors)
    "x116_length_bins" ->
      """WITH t AS (SELECT greatest(CAST(len(regexp_extract_all(text,
        |    '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT), 1) AS toks
        |  FROM documents),
        |b AS (SELECT ((toks - 1) // 16 + 1) * 16 AS bin_hi, toks FROM t),
        |g AS (SELECT bin_hi, count(*) AS n_docs,
        |        CAST(sum(toks) AS BIGINT) AS sum_tokens
        |      FROM b GROUP BY 1)
        |SELECT bin_hi, n_docs, sum_tokens,
        |  bin_hi * n_docs AS padded_tokens,
        |  ((bin_hi * n_docs - sum_tokens) * 10000) // (bin_hi * n_docs)
        |    AS waste_bp
        |FROM g ORDER BY bin_hi""".stripMargin,

    // x121: same exact-double band edges; count(DISTINCT) + the largest
    // single-band block per (segment, nation) group
    "x121_l_diversity" ->
      """WITH s AS (SELECT c_mktsegment, c_nationkey,
        |    CASE WHEN c_acctbal < 0 THEN 'debt'
        |         WHEN c_acctbal < 5000 THEN 'low'
        |         ELSE 'high' END AS sens
        |  FROM customer),
        |g AS (SELECT c_mktsegment, c_nationkey,
        |    CAST(count(*) AS BIGINT) AS n_custs,
        |    CAST(count(DISTINCT sens) AS BIGINT) AS n_sens
        |  FROM s GROUP BY 1, 2),
        |b AS (SELECT c_mktsegment, c_nationkey,
        |    CAST(max(block) AS BIGINT) AS max_block
        |  FROM (SELECT c_mktsegment, c_nationkey, sens,
        |          count(*) AS block FROM s GROUP BY 1, 2, 3)
        |  GROUP BY 1, 2)
        |SELECT g.c_mktsegment, g.c_nationkey, g.n_custs, g.n_sens,
        |  b.max_block,
        |  CASE WHEN g.n_sens >= 2 THEN CAST(1 AS BIGINT)
        |       ELSE CAST(0 AS BIGINT) END AS l_diverse
        |FROM g JOIN b USING (c_mktsegment, c_nationkey)
        |ORDER BY g.c_mktsegment, g.c_nationkey""".stripMargin,

    // x123: the md5-32 instr-fold per salt seeds both cuts; 1-based
    // inclusive slices, concat_ws keeps empty middles (both engines)
    "x123_fim_split" -> {
      def h(salt: String): String =
        s"""list_reduce(list_transform(
           |        string_split(substr(md5(concat(
           |          CAST(doc_id AS VARCHAR), '$salt')), 1, 8), ''),
           |        c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
           |      (a, b) -> a * 16 + b)""".stripMargin
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |           FROM documents),
         |d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
         |      FROM t),
         |cuts AS (SELECT doc_id, toks, n,
         |    1 + (${h(":fim-a")} % (n - 1)) AS ha,
         |    1 + (${h(":fim-b")} % (n - 1)) AS hb
         |  FROM d WHERE n >= 3),
         |f AS (SELECT doc_id, toks, n, least(ha, hb) AS c1,
         |        greatest(ha, hb) AS c2 FROM cuts)
         |SELECT d.doc_id, d.n AS n_tokens, f.c1, f.c2,
         |  CASE WHEN d.n >= 3 THEN CAST(1 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS fim_applied,
         |  CASE WHEN d.n >= 3 THEN concat(
         |      '<PRE> ', array_to_string(d.toks[1:f.c1], ' '),
         |      ' <SUF> ', array_to_string(d.toks[f.c2+1:d.n], ' '),
         |      ' <MID>',
         |      CASE WHEN f.c2 = f.c1 THEN ''
         |           ELSE concat(' ',
         |             array_to_string(d.toks[f.c1+1:f.c2], ' ')) END)
         |    ELSE array_to_string(d.toks, ' ') END AS psm_text
         |FROM d LEFT JOIN f USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },

    // x124: same md5-32 seeding per (doc, span); segment bounds by
    // floor-div; every token decision replayed with 1-based slicing
    "x124_span_corruption" -> {
      val h = """list_reduce(list_transform(
                |        string_split(substr(md5(concat(
                |          CAST(doc_id AS VARCHAR), ':span-',
                |          CAST(j AS VARCHAR))), 1, 8), ''),
                |        c -> CAST(instr('0123456789abcdef', c) - 1
                |          AS BIGINT)),
                |      (a, b) -> a * 16 + b)""".stripMargin
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
         |           FROM documents),
         |d AS (SELECT doc_id, text, toks, CAST(len(toks) AS BIGINT) AS n
         |      FROM t),
         |e AS (SELECT *, CASE WHEN n >= 10
         |        THEN greatest(1, (n * 15) // 300) ELSE 0 END AS s
         |      FROM d),
         |spn AS (SELECT *, CASE WHEN n >= 10 THEN
         |    list_transform(range(0, s), j -> {
         |      'j': j,
         |      'st': (j * n) // s + ($h
         |        % (((j + 1) * n) // s - (j * n) // s - 2))})
         |  ELSE CAST([] AS STRUCT(j BIGINT, st BIGINT)[]) END AS spans
         |  FROM e)
         |SELECT doc_id, n AS n_tokens, CAST(s AS BIGINT) AS n_spans,
         |  CAST(s * 3 AS BIGINT) AS corrupted_tokens,
         |  CASE WHEN n >= 10 THEN
         |    array_to_string(flatten(list_transform(range(0, n), p ->
         |      CASE
         |        WHEN len(list_filter(spans, sp -> sp.st = p)) > 0
         |        THEN [concat('<X_', CAST(
         |          list_filter(spans, sp -> sp.st = p)[1].j AS VARCHAR),
         |          '>')]
         |        WHEN len(list_filter(spans,
         |          sp -> p > sp.st AND p < sp.st + 3)) > 0
         |        THEN CAST([] AS VARCHAR[])
         |        ELSE [toks[p + 1]] END)), ' ')
         |  ELSE text END AS input_text,
         |  CASE WHEN n >= 10 THEN
         |    array_to_string(flatten(list_transform(spans, sp -> [
         |      concat('<X_', CAST(sp.j AS VARCHAR), '>'),
         |      toks[sp.st + 1], toks[sp.st + 2], toks[sp.st + 3]])), ' ')
         |  ELSE '' END AS target_text
         |FROM spn ORDER BY doc_id""".stripMargin
    },

    // x122: H·n = Σ c·(ln n − ln c), every ln frozen to 9dp nano-nats
    // (ln agrees bit-for-bit; sums exact; positive floor-divisions)
    "x122_unigram_entropy" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS token
        |           FROM documents),
        |c AS (SELECT source, token, count(*) AS c FROM t GROUP BY 1, 2),
        |s AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |        count(*) AS vocab FROM c GROUP BY 1),
        |j AS (SELECT c.source, c.c, s.n, s.vocab,
        |    CAST(CAST(round(ln(CAST(s.n AS DOUBLE)), 9) AS DECIMAL(20,9))
        |         * 1000000000 AS BIGINT)
        |  - CAST(CAST(round(ln(CAST(c.c AS DOUBLE)), 9) AS DECIMAL(20,9))
        |         * 1000000000 AS BIGINT) AS dn
        |  FROM c JOIN s USING (source))
        |SELECT source, first(n) AS n_tokens, first(vocab) AS vocab,
        |  CAST(sum(c * dn) AS BIGINT) // first(n) AS entropy_nano,
        |  (first(vocab) * 1000) // first(n) AS ttr_permille
        |FROM j GROUP BY source ORDER BY source""".stripMargin,

    // x125: per-sample closed-form replay ((id*7 + s*13 + c*31) % 2048
    // − 1024 squared), fixed 16-frame windows, q25-style islands
    "x125_audio_segments" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 2 AS nch,
        |    64 + doc_id % 97 AS ns FROM documents),
        |w AS (SELECT doc_id, nch, ns,
        |    unnest(range((ns + 15) // 16)) AS win FROM d),
        |fr AS (SELECT doc_id, nch, win,
        |    unnest(range(win * 16, least(win * 16 + 16, ns))) AS s
        |  FROM w),
        |sm AS (SELECT doc_id, win, s, unnest(range(nch)) AS c FROM fr),
        |en AS (SELECT doc_id, win,
        |    CAST(sum(((doc_id * 7 + s * 13 + c * 31) % 2048 - 1024)
        |           * ((doc_id * 7 + s * 13 + c * 31) % 2048 - 1024))
        |      AS BIGINT) AS energy,
        |    CAST(count(*) AS BIGINT) AS n_samples
        |  FROM sm GROUP BY 1, 2),
        |act AS (SELECT * FROM en WHERE energy // n_samples > 349525),
        |mk AS (SELECT *, CASE WHEN win - lag(win) OVER (
        |        PARTITION BY doc_id ORDER BY win) = 1 THEN 0 ELSE 1 END
        |      AS new_seg FROM act),
        |sg AS (SELECT *, CAST(sum(new_seg) OVER (PARTITION BY doc_id
        |        ORDER BY win ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg
        |      FROM mk)
        |SELECT doc_id AS media_id, seg, min(win) AS win_start,
        |  max(win) AS win_end, CAST(count(*) AS BIGINT) AS n_windows,
        |  CAST(sum(energy) AS BIGINT) AS energy_sum
        |FROM sg GROUP BY 1, 2
        |ORDER BY media_id, win_start""".stripMargin,

    // x119: the x82 closed form at stride 1 → per-frame totals, then
    // the same lag window; frame 0's delta/is_cut stay NULL
    "x119_scene_cuts" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w,
        |    8 + (doc_id // 9) % 9 AS h, 4 + doc_id % 5 AS nf
        |  FROM documents),
        |f AS (SELECT doc_id, w, h, unnest(range(nf)) AS fi FROM d),
        |px AS (SELECT doc_id, w, h, fi,
        |    unnest(range(w * h * 3)) AS i FROM f),
        |t AS (SELECT doc_id, fi,
        |    CAST(sum((doc_id * 131 + fi * 17 + i * 29) % 256) AS BIGINT)
        |      AS total
        |  FROM px GROUP BY doc_id, fi),
        |lg AS (SELECT doc_id, fi, total,
        |    abs(total - lag(total, 1) OVER (PARTITION BY doc_id
        |      ORDER BY fi)) AS delta
        |  FROM t)
        |SELECT doc_id AS media_id, CAST(fi AS BIGINT) AS frame_idx,
        |  total, delta,
        |  CASE WHEN delta IS NULL THEN NULL
        |       WHEN delta > 200 THEN CAST(1 AS BIGINT)
        |       ELSE CAST(0 AS BIGINT) END AS is_cut
        |FROM lg ORDER BY media_id, frame_idx""".stripMargin,

    // x117: the md5-hex→int instr-fold recipe (x10 family) hashes each
    // k-gram; window mins via 1-based clamped list slices. `f`/`kf` are
    // multiply referenced → AS MATERIALIZED (the x75 CTE-inlining rule).
    "x117_winnowing" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |h AS (SELECT doc_id, list_transform(
        |        list_transform(range(1, greatest(len(toks) - 1, 1)),
        |          i -> array_to_string(toks[i:i+2], ' ')),
        |        s -> list_reduce(list_transform(
        |          string_split(substr(md5(s), 1, 8), ''),
        |          c -> instr('0123456789abcdef', c) - 1),
        |          (a, b) -> a * 16 + b)) AS hs
        |      FROM t),
        |sel AS (SELECT doc_id, list_distinct(list_transform(
        |          range(1, greatest(len(hs) - 3, 1) + 1),
        |          i -> list_min(hs[i:i+3]))) AS fps
        |        FROM h WHERE len(hs) > 0),
        |f AS MATERIALIZED (SELECT doc_id, unnest(fps) AS fph FROM sel),
        |r AS (SELECT fph FROM f GROUP BY fph HAVING count(*) <= 50),
        |kf AS MATERIALIZED (SELECT f.* FROM f JOIN r USING (fph))
        |SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
        |FROM kf a JOIN kf b ON a.fph = b.fph AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY d1, d2""".stripMargin,

    // x126: identical boundary rule (Rabin-Karp hash of the 8-char
    // window ending at i, B=257 M=1e9+7, divisible by 16 — the native
    // CdcCuts rule, reproduced per-position; BIGINT casts because
    // DuckDB INT multiplication overflows, weights are B^j mod M for
    // the char j back from i), identical cut list (|| [len], deduped,
    // sorted) and md5-hex block identity; ppm by positive floor
    // division so // and div agree. Lengths cast to BIGINT to match
    // Spark's long len.
    "x126_cdc_blocks" ->
      """WITH d AS (SELECT doc_id, text,
        |             CAST(length(text) AS BIGINT) AS len
        |           FROM documents),
        |c AS (SELECT doc_id, i
        |      FROM (SELECT doc_id, text,
        |              unnest(range(8, len + 1)) AS i
        |            FROM d WHERE len >= 8)
        |      WHERE (
        |          CAST(ascii(substr(text, CAST(i - 7 AS INT), 1))
        |            AS BIGINT) * 13163680
        |        + CAST(ascii(substr(text, CAST(i - 6 AS INT), 1))
        |            AS BIGINT) * 805498697
        |        + CAST(ascii(substr(text, CAST(i - 5 AS INT), 1))
        |            AS BIGINT) * 154885210
        |        + CAST(ascii(substr(text, CAST(i - 4 AS INT), 1))
        |            AS BIGINT) * 362470373
        |        + CAST(ascii(substr(text, CAST(i - 3 AS INT), 1))
        |            AS BIGINT) * 16974593
        |        + CAST(ascii(substr(text, CAST(i - 2 AS INT), 1))
        |            AS BIGINT) * 66049
        |        + CAST(ascii(substr(text, CAST(i - 1 AS INT), 1))
        |            AS BIGINT) * 257
        |        + CAST(ascii(substr(text, CAST(i AS INT), 1))
        |            AS BIGINT)) % 1000000007 % 16 = 0),
        |cl AS (SELECT doc_id, list_sort(list(i)) AS cuts
        |       FROM c GROUP BY 1),
        |w AS (SELECT d.doc_id, d.text, d.len,
        |        list_sort(list_distinct(
        |          COALESCE(cl.cuts, CAST([] AS BIGINT[])) || [d.len]))
        |          AS cuts2
        |      FROM d LEFT JOIN cl USING (doc_id)),
        |b AS (SELECT doc_id, len,
        |        cuts2[CAST(j AS INT)]
        |          - (CASE WHEN j = 1 THEN 0
        |                  ELSE cuts2[CAST(j - 1 AS INT)] END) AS blen,
        |        md5(substr(text,
        |          CAST((CASE WHEN j = 1 THEN 0
        |                     ELSE cuts2[CAST(j - 1 AS INT)] END) + 1
        |            AS INT),
        |          CAST(cuts2[CAST(j AS INT)]
        |            - (CASE WHEN j = 1 THEN 0
        |                    ELSE cuts2[CAST(j - 1 AS INT)] END)
        |            AS INT))) AS bh
        |      FROM (SELECT doc_id, text, len, cuts2,
        |              unnest(range(1, CAST(len(cuts2) + 1 AS BIGINT)))
        |                AS j
        |            FROM w)),
        |f AS (SELECT bh, count(DISTINCT doc_id) AS n_docs_b
        |      FROM b GROUP BY 1)
        |SELECT b.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_blocks,
        |  CAST(sum(CASE WHEN n_docs_b >= 2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS dup_blocks,
        |  CAST(sum(CASE WHEN n_docs_b >= 2 THEN blen ELSE 0 END)
        |    AS BIGINT) AS dup_chars,
        |  CAST(sum(CASE WHEN n_docs_b >= 2 THEN blen ELSE 0 END)
        |    * 1000000 // greatest(any_value(len), 1) AS BIGINT) AS dup_ppm
        |FROM b JOIN f USING (bh)
        |GROUP BY b.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    // x127: identical lined-corpus construction (per-source header,
    // 10-token body chunks via 1-based inclusive list slicing = Spark
    // slice, corpus footer), identical >= 3-distinct-docs drop rule on
    // md5(line). COALESCE(array_to_string(...), '') because an
    // all-removed doc must reassemble to '' — DuckDB's FILTERed list
    // is NULL on zero rows AND array_to_string([]) is itself NULL,
    // while Spark's collect_list is never null (REAL at sf0.1: doc 100
    // is pure boilerplate); BIGINT casts for the HUGEINT sums.
    "x127_line_dedup" ->
      """WITH l AS (SELECT doc_id,
        |    ['== ' || source || ' header =='] ||
        |    list_transform(
        |      range(0, CAST(ceil(len(string_split(text, ' ')) / 10.0)
        |        AS BIGINT)),
        |      i -> array_to_string(string_split(text, ' ')
        |        [CAST(i * 10 + 1 AS INT):CAST(i * 10 + 10 AS INT)], ' '))
        |    || ['-- standard license footer --'] AS lines
        |  FROM documents),
        |e AS (SELECT doc_id, i AS pos, lines[CAST(i AS INT)] AS line
        |      FROM (SELECT doc_id, lines,
        |              unnest(range(1, len(lines) + 1)) AS i
        |            FROM l)),
        |f AS (SELECT md5(line) AS lh, count(DISTINCT doc_id) AS line_docs
        |      FROM e GROUP BY 1)
        |SELECT e.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN line_docs >= 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS lines_removed,
        |  CAST(sum(CASE WHEN line_docs >= 3 THEN length(line) ELSE 0 END)
        |    AS BIGINT) AS chars_removed,
        |  COALESCE(array_to_string(
        |    list(line ORDER BY pos) FILTER (WHERE line_docs < 3),
        |    chr(10)), '') AS text_clean
        |FROM e JOIN f ON md5(e.line) = f.lh
        |GROUP BY e.doc_id
        |ORDER BY e.doc_id""".stripMargin,

    // x128: the synthetic-URL + canonicalization + registered-domain
    // chain is GENERATED (UrlOps.urlDomainCteDuck) from the same Scala
    // recipe and suffix table as the entry — the engines cannot drift;
    // row_number is BIGINT in DuckDB and the Spark side casts to match.
    // NOTE the concatenation: the generated chain contains `||` at line
    // starts, which an OUTER stripMargin would eat one pipe of.
    "x128_domain_cap" ->
      (s"WITH ${UrlOps.urlDomainCteDuck}\n" +
        """SELECT doc_id, url_canonical, domain, n_docs_domain, domain_rank
        |FROM (SELECT doc_id, url_canonical, domain,
        |        count(*) OVER (PARTITION BY domain) AS n_docs_domain,
        |        row_number() OVER (PARTITION BY domain
        |          ORDER BY md5(url_canonical), doc_id) AS domain_rank
        |      FROM v)
        |WHERE domain_rank <= 5
        |ORDER BY doc_id""".stripMargin),

    // x139: the same generated chain; the opt-out registry is the
    // pinned md5 rule over the distinct domain universe; count/sum
    // CASTs align HUGEINT to Spark's BIGINT.
    "x139_optout_filter" ->
      (s"WITH ${UrlOps.urlDomainCteDuck},\n" +
        s"""o AS (SELECT DISTINCT domain FROM v
        |      WHERE ${UrlOps.optOutRuleDuck}
        |      ORDER BY domain LIMIT 100000)
        |SELECT v.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN o.domain IS NOT NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_dropped,
        |  CAST(sum(CASE WHEN o.domain IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_kept,
        |  CAST(count(DISTINCT CASE WHEN o.domain IS NOT NULL
        |       THEN v.domain END) AS BIGINT) AS n_optout_domains
        |FROM v LEFT JOIN o ON v.domain = o.domain
        |GROUP BY v.source
        |ORDER BY v.source""".stripMargin),

    // x118: DuckDB emb[1:L] is 1-based inclusive (= Spark slice(emb,1,L));
    // the DOUBLE[] casts keep list_cosine_similarity in double math,
    // bit-identical to the native cosine on the float prefix.
    // x138: identical margin pipeline over DOUBLE[] casts.
    "x138_bitext_mine" -> Similarity.bitextMineOracle(),

    // x140: the DYNAMIC-C k-means replay (C from the same √N/6 rule as
    // the entry — the engines cannot drift) buckets both sides; every
    // vector probes its TOP-2 buckets and a pair is scored when either
    // side retrieves the other — union, dedup, score once. The oracle
    // ranks all C csims through a window (fine at oracle scale); the
    // entry's native TopProbes returns the same top-2 list with no N×C
    // explode. The margin/mutual-best chain is the SAME generated text
    // as x138's (bitextChainSql) — the legs cannot drift.
    "x140_bitext_ann" ->
      (s"WITH $kmeansCtesDyn,\n" +
        """csims AS (SELECT e.vec_id, c.centroid_id,
        |    round(list_cosine_similarity(e.emb, c.cv), 6) AS csim
        |  FROM e, cent2 c),
        |probes AS MATERIALIZED (SELECT vec_id, centroid_id AS pbucket
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY csim DESC, centroid_id) AS prn FROM csims)
        |  WHERE prn <= 2),
        |xs AS (SELECT vec_id AS x_id, emb AS xv, bucket
        |  FROM asg WHERE vec_id % 2 = 0),
        |ys AS (SELECT vec_id AS y_id, emb AS yv, bucket
        |  FROM asg WHERE vec_id % 2 = 1),
        |cp AS MATERIALIZED (
        |  SELECT p.vec_id AS x_id, y.y_id
        |  FROM probes p JOIN ys y ON p.pbucket = y.bucket
        |  WHERE p.vec_id % 2 = 0
        |  UNION
        |  SELECT x.x_id, p.vec_id AS y_id
        |  FROM probes p JOIN xs x ON p.pbucket = x.bucket
        |  WHERE p.vec_id % 2 = 1),
        |s AS MATERIALIZED (SELECT cp.x_id, cp.y_id,
        |    CAST(CAST(round(list_cosine_similarity(xs.xv, ys.yv), 6)
        |         AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS sim_micro
        |  FROM cp JOIN xs ON cp.x_id = xs.x_id
        |  JOIN ys ON cp.y_id = ys.y_id),
        |""".stripMargin + Similarity.bitextChainSql()),

    // x141: the x6 replay with the label predicate applied to the
    // candidate side BEFORE the probe (pre-filter semantics); label
    // joins back from the raw table since the k-means CTEs carry only
    // (vec_id, emb).
    "x141_filtered_knn" ->
      s"""WITH $kmeansCtes,
         |cand AS (SELECT a.vec_id, a.emb, a.bucket, e2.label
         |  FROM asg a JOIN embeddings e2 USING (vec_id)
         |  WHERE e2.label IN (2, 5)),
         |q AS (SELECT vec_id AS query_id, emb AS qv, bucket
         |      FROM asg WHERE vec_id < 10),
         |scored AS (SELECT query_id, a.bucket, a.vec_id AS cand_id,
         |    a.label, round(list_cosine_similarity(qv, a.emb), 6) AS sim
         |  FROM cand a JOIN q USING (bucket) WHERE a.vec_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (
         |        PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rn
         |      FROM scored)
         |SELECT query_id, bucket, cand_id, label, sim, CAST(rn AS INT) AS rn
         |FROM r WHERE rn <= 3
         |ORDER BY query_id, rn""".stripMargin,

    "x118_matryoshka" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < 10),
         |lv AS (SELECT unnest([64, 32, 16]) AS level),
         |sc AS (
         |  SELECT l.level, q.query_id, e.vec_id AS cand_id,
         |    round(list_cosine_similarity(
         |      CAST(q.qv[1:l.level] AS DOUBLE[]),
         |      CAST(e.embedding[1:l.level] AS DOUBLE[])), 6) AS sim
         |  FROM embeddings e, q, lv l WHERE e.vec_id <> q.query_id),
         |tk AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id, level
         |    ORDER BY sim DESC, cand_id) AS rn
         |  FROM sc QUALIFY rn <= 5),
         |tr AS (SELECT query_id, cand_id FROM tk WHERE level = 64)
         |SELECT t.query_id, t.level,
         |  CAST(count(f.cand_id) AS BIGINT) AS n_hit,
         |  CAST(count(f.cand_id) AS BIGINT) * 1000000 // 5 AS recall_ppm
         |FROM tk t LEFT JOIN tr f
         |  ON t.query_id = f.query_id AND t.cand_id = f.cand_id
         |GROUP BY t.query_id, t.level
         |ORDER BY t.query_id, t.level""".stripMargin,

    // x28: DuckDB list slicing toks[a:b] is 1-based inclusive, matching
    // Spark's slice(toks, a, len); md5(varchar) == md5(string as binary).
    "x28_span_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |sp AS (SELECT doc_id,
        |         md5(array_to_string(toks[CAST(i*10+1 AS INT) : CAST(i*10+10 AS INT)], ' '))
        |           AS span_md5
        |       FROM (SELECT doc_id, toks,
        |               unnest(range(CAST(floor(len(toks) / 10) AS BIGINT))) AS i
        |             FROM t)),
        |d AS (SELECT span_md5, count(DISTINCT doc_id) AS span_docs
        |      FROM sp GROUP BY 1),
        |a AS (SELECT doc_id, count(*) AS n_spans,
        |        CAST(SUM(CASE WHEN span_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_dup_spans
        |      FROM sp JOIN d USING (span_md5) GROUP BY 1)
        |SELECT doc_id, n_spans, n_dup_spans,
        |  round(n_dup_spans / n_spans, 6) AS dup_ratio
        |FROM a ORDER BY doc_id""".stripMargin,

    // x27: identical double math — cast to DOUBLE[] first, floor(v·127/s
    // + 0.5) rounding, in-order error fold, zero-vector scale guard.
    "x27_embed_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x
        |           FROM embeddings),
        |s AS (SELECT vec_id, x,
        |        list_max(list_transform(x, v -> abs(v))) AS scale
        |      FROM e),
        |g AS (SELECT vec_id, x, scale,
        |        CASE WHEN scale = 0 THEN 1 ELSE scale END AS s_safe
        |      FROM s),
        |qq AS (SELECT vec_id, x, scale, s_safe,
        |        list_transform(x, v ->
        |          CAST(floor(v / s_safe * 127 + 0.5) AS INT)) AS q
        |       FROM g)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  list_min(q) AS q_min, list_max(q) AS q_max,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  round(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(range(len(x)), i ->
        |      (x[i+1] - q[i+1] * s_safe / 127)
        |      * (x[i+1] - q[i+1] * s_safe / 127))),
        |    (a, b) -> a + b)), 6) AS recon_err
        |FROM qq ORDER BY vec_id""".stripMargin,

    // x24: per-token log-probs rounded to 9dp then summed as EXACT
    // DECIMAL — the order-independence trick that makes a sum of doubles
    // cross-engine deterministic.
    "x24_unigram_logprob" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |total AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM toks),
        |freq AS (SELECT tok, count(*) AS n_tok FROM toks GROUP BY 1),
        |lp AS (SELECT doc_id,
        |    CAST(round(ln(CAST(n_tok AS DOUBLE) / n_total), 9)
        |         AS DECIMAL(28,12)) AS lp
        |  FROM toks JOIN freq USING (tok), total),
        |agg AS (SELECT doc_id, count(*) AS n_tokens, sum(lp) AS sum_lp
        |        FROM lp GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |  round(CAST(sum_lp AS DOUBLE) / n_tokens, 6) AS avg_logprob,
        |  round(CAST(sum_lp AS DOUBLE) / n_tokens, 6) >= -8.0 AS keep
        |FROM agg ORDER BY doc_id""".stripMargin,

    "x14_media_frames" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    unnest(range(CAST(ceil(length(text) / 256.0) AS BIGINT))) AS frame_idx
        |  FROM documents)
        |SELECT doc_id AS media_id, frame_idx,
        |  md5(substr(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS frame_md5,
        |  CAST(length(substr(text, CAST(frame_idx * 256 + 1 AS INT), 256))
        |       AS BIGINT) AS frame_bytes
        |FROM f WHERE frame_idx % 2 = 0
        |ORDER BY media_id, frame_idx""".stripMargin,

    "x11_media_meta" ->
      """SELECT doc_id AS media_id, source AS origin,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  lower(hex(encode(substr(text, 1, 4)))) AS header_hex,
        |  CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin,

    // x12: the PPM payload is generated from a closed form over doc_id
    // (dims 8+id%9 × 8+(id/9)%9, pixel byte i = (id*131+i*29)%256), so
    // the oracle recomputes the decoded per-channel sums WITHOUT touching
    // the bytes — the Spark side must encode AND parse correctly to
    // match. All outputs are exact BIGINTs: zero rounding-tie risk.
    "x12_media_decode" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w,
        |    8 + (doc_id // 9) % 9 AS h FROM documents),
        |px AS (SELECT doc_id, w, h, unnest(range(w * h * 3)) AS i FROM d),
        |v AS (SELECT doc_id, w, h, i % 3 AS c,
        |    (doc_id * 131 + i * 29) % 256 AS v FROM px)
        |SELECT doc_id AS media_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height, CAST(3 AS BIGINT) AS channels,
        |  CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS r_sum,
        |  CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS g_sum,
        |  CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS b_sum,
        |  CAST(w * h AS BIGINT) AS n_px
        |FROM v GROUP BY doc_id, w, h ORDER BY media_id""".stripMargin,

    // x82: the sampled frames' pixel bytes are (id*131 + f*17 + i*29)
    // % 256; the oracle recomputes the decoded per-channel sums for the
    // strided frames directly from the closed form — any walker
    // off-by-one (frame boundary, header length) breaks the hash.
    "x82_video_frames" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w,
        |    8 + (doc_id // 9) % 9 AS h, 4 + doc_id % 5 AS nf
        |  FROM documents),
        |f AS (SELECT doc_id, w, h, unnest(range(nf)) AS fi FROM d),
        |sf AS (SELECT * FROM f WHERE fi % 2 = 0),
        |px AS (SELECT doc_id, w, h, fi,
        |    unnest(range(w * h * 3)) AS i FROM sf),
        |v AS (SELECT doc_id, w, h, fi, i % 3 AS c,
        |    (doc_id * 131 + fi * 17 + i * 29) % 256 AS v FROM px)
        |SELECT doc_id AS media_id, CAST(fi AS BIGINT) AS frame_idx,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS r_sum,
        |  CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS g_sum,
        |  CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS b_sum,
        |  CAST(w * h AS BIGINT) AS n_px
        |FROM v GROUP BY doc_id, w, h, fi
        |ORDER BY media_id, frame_idx""".stripMargin,

    // x65: the box filter floor-averages each factor×factor block per
    // channel; the oracle recomputes every output pixel from the same
    // closed form (4 source lookups each) and sums per channel — again
    // exact integers end to end.
    "x65_media_resize" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w,
        |    8 + (doc_id // 9) % 9 AS h FROM documents),
        |o AS (SELECT doc_id, w, h, w // 2 AS ow, h // 2 AS oh FROM d),
        |j AS (SELECT doc_id, w, ow, oh,
        |    unnest(range(ow * oh * 3)) AS k FROM o),
        |b AS (SELECT doc_id, w, ow, oh, k % 3 AS c,
        |    (k // 3) % ow AS bx, (k // 3) // ow AS by FROM j),
        |p AS (SELECT doc_id, ow, oh, c,
        |    (((doc_id * 131 + ((by*2    ) * w + bx*2    ) * 3 * 29 + c * 29) % 256)
        |   + ((doc_id * 131 + ((by*2    ) * w + bx*2 + 1) * 3 * 29 + c * 29) % 256)
        |   + ((doc_id * 131 + ((by*2 + 1) * w + bx*2    ) * 3 * 29 + c * 29) % 256)
        |   + ((doc_id * 131 + ((by*2 + 1) * w + bx*2 + 1) * 3 * 29 + c * 29) % 256))
        |    // 4 AS v
        |  FROM b)
        |SELECT doc_id AS media_id, CAST(ow AS BIGINT) AS out_w,
        |  CAST(oh AS BIGINT) AS out_h,
        |  CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS r_sum,
        |  CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS g_sum,
        |  CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS b_sum,
        |  CAST(ow * oh AS BIGINT) AS n_px
        |FROM p GROUP BY doc_id, ow, oh ORDER BY media_id""".stripMargin,

    // x66: WAV samples are ((id*7 + s*13 + c*31) % 2048) - 1024; the
    // oracle recomputes per-channel sum-of-squares and peak directly.
    "x66_wav_decode" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 2 AS nch,
        |    64 + doc_id % 97 AS ns FROM documents),
        |k AS (SELECT doc_id, nch, ns, unnest(range(ns * nch)) AS k FROM d),
        |v AS (SELECT doc_id, ns, k % nch AS c,
        |    ((doc_id * 7 + (k // nch) * 13 + (k % nch) * 31) % 2048) - 1024 AS a
        |  FROM k)
        |SELECT doc_id AS media_id, CAST(c AS BIGINT) AS channel,
        |  CAST(ns AS BIGINT) AS n_samples,
        |  CAST(sum(a * a) AS BIGINT) AS sum_sq,
        |  CAST(max(abs(a)) AS BIGINT) AS peak_abs
        |FROM v GROUP BY doc_id, ns, c ORDER BY media_id, channel""".stripMargin,

    // x67: the md5-hex→int recipe (q19/x36 precedent) mod 1000 gives
    // the split bucket; thresholds and token counts are exact integers.
    "x72_snapshot_diff" ->
      """WITH a AS (SELECT doc_id, source, text FROM documents),
        |b AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM a WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, source, 'new ' || text FROM a
        |  WHERE doc_id % 11 = 0),
        |ah AS (SELECT doc_id, source AS a_source, md5(text) AS old_md5 FROM a),
        |bh AS (SELECT doc_id, source AS b_source, md5(text) AS new_md5 FROM b),
        |d AS (
        |  SELECT COALESCE(ah.doc_id, bh.doc_id) AS doc_id,
        |    COALESCE(a_source, b_source) AS source,
        |    CASE WHEN new_md5 IS NULL THEN 'removed'
        |         WHEN old_md5 IS NULL THEN 'added'
        |         WHEN old_md5 <> new_md5 THEN 'changed'
        |         ELSE 'unchanged' END AS status,
        |    old_md5, new_md5
        |  FROM ah FULL OUTER JOIN bh ON ah.doc_id = bh.doc_id)
        |SELECT * FROM d WHERE status <> 'unchanged' ORDER BY doc_id""".stripMargin,

    "x73_vocab_build" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM tok GROUP BY token),
        |total AS (SELECT CAST(SUM(n_occ) AS BIGINT) AS total_occ FROM counts),
        |top AS (SELECT token, n_occ, n_docs FROM counts
        |  ORDER BY n_occ DESC, token LIMIT 64),
        |ranked AS (SELECT token, n_occ, n_docs,
        |    ROW_NUMBER() OVER (ORDER BY n_occ DESC, token) AS rank,
        |    CAST(SUM(n_occ) OVER (ORDER BY n_occ DESC, token
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_occ
        |  FROM top)
        |SELECT rank, token, n_occ, n_docs, cum_occ,
        |  CAST((cum_occ * 1000000) // total_occ AS BIGINT) AS cov_ppm
        |FROM ranked, total ORDER BY rank""".stripMargin,

    "x75_bpe_train" -> Bpe.trainOracle(Bpe.Steps),

    "x78_pq" -> pqSql,

    "x80_mmr" -> Similarity.mmrOracle(),

    "x81_random_projection" -> Similarity.randomProjectionOracle(),

    // x79: DSIR — the weight table replays the exact integer nano-nat
    // recipe (each ln rounded to 9dp and scaled BEFORE any combination,
    // x56's schedule), so scores/keys are int64 on both engines; the
    // Gumbel uniform is the pinned md5-32 (h+0.5)/2^32 with the 'dsir:'
    // salt. DuckDB list indexing is 1-based (toks[i], toks[i+1] over
    // i ∈ range(1, len)) matching Spark's sequence(1, size-1) guard.
    "x79_dsir" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        |           FROM documents),
        |doc_bk AS (SELECT doc_id, source,
        |    ('0x' || substr(md5(toks[CAST(i AS INT)] || ' ' ||
        |        toks[CAST(i AS INT) + 1]), 1, 8))::BIGINT % 2048 AS bucket
        |  FROM (SELECT doc_id, source, toks,
        |          unnest(range(1, len(toks))) AS i FROM d)),
        |cnt AS (SELECT bucket,
        |    sum(CASE WHEN source = 'src9' THEN 1 ELSE 0 END) AS tgt,
        |    sum(CASE WHEN source = 'src9' THEN 0 ELSE 1 END) AS raw
        |  FROM doc_bk GROUP BY 1),
        |tot AS (SELECT CAST(sum(tgt) AS BIGINT) AS tgt_tot,
        |               CAST(sum(raw) AS BIGINT) AS raw_tot FROM cnt),
        |w AS (SELECT b.bucket,
        |    CAST(CAST(round(ln(CAST(coalesce(c.tgt, 0) + 1 AS DOUBLE)), 9)
        |      AS DECIMAL(20,9)) * 1000000000 AS BIGINT)
        |  - CAST(CAST(round(ln(CAST(t.tgt_tot + 2048 AS DOUBLE)), 9)
        |      AS DECIMAL(20,9)) * 1000000000 AS BIGINT)
        |  - (CAST(CAST(round(ln(CAST(coalesce(c.raw, 0) + 1 AS DOUBLE)), 9)
        |       AS DECIMAL(20,9)) * 1000000000 AS BIGINT)
        |   - CAST(CAST(round(ln(CAST(t.raw_tot + 2048 AS DOUBLE)), 9)
        |       AS DECIMAL(20,9)) * 1000000000 AS BIGINT)) AS w_nano
        |  FROM (SELECT unnest(range(2048)) AS bucket) b
        |  LEFT JOIN cnt c ON b.bucket = c.bucket, tot t),
        |score AS (SELECT k.doc_id, CAST(sum(w.w_nano) AS BIGINT)
        |            AS score_nano
        |          FROM doc_bk k JOIN w ON k.bucket = w.bucket GROUP BY 1),
        |g AS (SELECT doc_id, source,
        |    greatest(len(string_split(text, ' ')) - 1, 0) AS n_bigrams,
        |    CAST(CAST(round(-ln(-ln(
        |        (('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)),
        |          1, 8))::BIGINT + 0.5) / 4294967296.0)), 9)
        |      AS DECIMAL(20,9)) * 1000000000 AS BIGINT) AS gumbel_nano
        |  FROM documents),
        |keyed AS (SELECT g.doc_id, g.source, g.n_bigrams,
        |    coalesce(s.score_nano, 0) AS score_nano, g.gumbel_nano,
        |    coalesce(s.score_nano, 0) + g.gumbel_nano AS key_nano
        |  FROM g LEFT JOIN score s ON g.doc_id = s.doc_id),
        |r AS (SELECT doc_id, source, n_bigrams, score_nano, gumbel_nano,
        |        key_nano, CAST(row_number() OVER (
        |          ORDER BY key_nano DESC, doc_id) AS INT) AS "rank"
        |      FROM keyed)
        |SELECT doc_id, source, n_bigrams, score_nano, gumbel_nano,
        |  key_nano, "rank"
        |FROM r WHERE "rank" <= 100 ORDER BY "rank"""".stripMargin,

    "x77_ccnet_buckets" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM tok),
        |f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_tok
        |      FROM tok GROUP BY tok),
        |m AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS m
        |      FROM tok GROUP BY 1, 2),
        |s AS (SELECT doc_id, CAST(SUM(m.m) AS BIGINT) AS n_tokens,
        |    CAST(-SUM(m.m * CAST(CAST(round(ln(f.n_tok / n.n_total), 9)
        |        AS DECIMAL(20,9)) * 1000000000 AS BIGINT)) AS BIGINT)
        |      AS nll_nano_sum
        |  FROM m JOIN f USING (tok), n GROUP BY doc_id),
        |sc AS (SELECT doc_id, n_tokens,
        |    nll_nano_sum // n_tokens AS nll_nano FROM s),
        |b AS (SELECT quantile_cont(nll_nano, [0.25, 0.75]) AS q FROM sc)
        |SELECT doc_id, n_tokens, CAST(nll_nano AS BIGINT) AS nll_nano,
        |  CASE WHEN nll_nano <= q[1] THEN 'head'
        |       WHEN nll_nano > q[2] THEN 'tail'
        |       ELSE 'middle' END AS bucket,
        |  (CASE WHEN nll_nano > q[2] THEN 'tail' ELSE '' END) <> 'tail'
        |    AS kept
        |FROM sc, b ORDER BY doc_id""".stripMargin,

    "x76_bpe_tokenize" -> Bpe.tokenizeOracle(Bpe.Steps),

    "x87_tokenizer_eval" -> Bpe.tokenizerEvalOracle(Bpe.Steps),

    // x89: distinct-analyzed-token ∩ term-list cardinality, gated at m=2
    "x89_terms_set" ->
      s"""SELECT doc_id,
         |  CAST(len(list_intersect(list_distinct(${anTokSql("text")}),
         |    ['spark', 'query', 'stream'])) AS BIGINT) AS n_matched
         |FROM documents
         |WHERE len(list_intersect(list_distinct(${anTokSql("text")}),
         |    ['spark', 'query', 'stream'])) >= 2
         |ORDER BY doc_id""".stripMargin,

    "x74_range_shards" ->
      """WITH k AS (SELECT doc_id,
        |    list_reduce(list_transform(
        |      string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 6), ''),
        |      c -> instr('0123456789abcdef', c) - 1),
        |      (a, b) -> a * 16 + b) AS key,
        |    CAST(ceil(len(text) / 4.0) AS BIGINT) AS est_tokens
        |  FROM documents),
        |b AS (SELECT quantile_cont(key,
        |    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bnds FROM k),
        |a AS (SELECT key, est_tokens,
        |    CAST(len(list_filter(bnds, x -> key > x)) AS BIGINT) AS shard
        |  FROM k, b)
        |SELECT shard, COUNT(*) AS n_docs,
        |  CAST(MIN(key) AS BIGINT) AS key_min,
        |  CAST(MAX(key) AS BIGINT) AS key_max,
        |  CAST(SUM(est_tokens) AS BIGINT) AS tok_sum
        |FROM a GROUP BY shard ORDER BY shard""".stripMargin,

    "x67_split" ->
      """WITH b AS (SELECT source, doc_id,
        |    list_reduce(list_transform(
        |      string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''),
        |      c -> instr('0123456789abcdef', c) - 1),
        |      (a, b) -> a * 16 + b) % 1000 AS bucket,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |p AS (SELECT source, bucket, n_toks,
        |    CASE WHEN bucket < 960 THEN 'train'
        |         WHEN bucket < 980 THEN 'val' ELSE 'test' END AS part
        |  FROM b)
        |SELECT source, part, COUNT(*) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS tok_sum,
        |  CAST(min(bucket) AS BIGINT) AS b_min,
        |  CAST(max(bucket) AS BIGINT) AS b_max
        |FROM p GROUP BY source, part ORDER BY source, part""".stripMargin,

    // x41: composes the PROVEN x8 / x28 / x17 oracle forms (identical
    // score rounding, span md5s, bucket hex parse) under the same gate
    // order; thresholds compare identically-rounded doubles, so the
    // branch taken can never diverge between engines.
    "x41_curation_decisions" ->
      """WITH q AS (SELECT doc_id,
        |    round(least(1.0, len(string_split(text, ' ')) / 100)
        |      * (len(list_distinct(string_split(text, ' ')))
        |         / len(string_split(text, ' '))), 6) AS score
        |  FROM documents),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |      FROM documents),
        |sp AS (SELECT doc_id,
        |         md5(array_to_string(toks[CAST(i*10+1 AS INT) : CAST(i*10+10 AS INT)], ' '))
        |           AS span_md5
        |       FROM (SELECT doc_id, toks,
        |               unnest(range(CAST(floor(len(toks) / 10) AS BIGINT))) AS i
        |             FROM t)),
        |d AS (SELECT span_md5, count(DISTINCT doc_id) AS span_docs
        |      FROM sp GROUP BY 1),
        |r AS (SELECT doc_id,
        |        round(CAST(SUM(CASE WHEN span_docs > 1 THEN 1 ELSE 0 END)
        |                   AS BIGINT) / count(*), 6) AS dup_ratio
        |      FROM sp JOIN d USING (span_md5) GROUP BY 1),
        |b AS (SELECT doc_id, source,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT)
        |          AS bucket
        |      FROM documents),
        |j AS (SELECT b.doc_id, b.source, q.score,
        |        COALESCE(r.dup_ratio, 0.0) AS dup_ratio, b.bucket
        |      FROM b JOIN q USING (doc_id) LEFT JOIN r USING (doc_id)),
        |v AS (SELECT *,
        |        CASE WHEN dup_ratio >= 0.5 THEN 'span_dup'
        |             WHEN score < 0.2 THEN 'low_quality'
        |             WHEN NOT (source = 'src0'
        |                       OR (source = 'src1' AND bucket < 128)
        |                       OR (source <> 'src0' AND source <> 'src1'
        |                           AND bucket < 64))
        |               THEN 'not_sampled' END AS drop_reason
        |      FROM j)
        |SELECT doc_id, source, score, dup_ratio,
        |  drop_reason IS NULL AS keep, drop_reason
        |FROM v ORDER BY doc_id""".stripMargin,

    // x42: anchor on each 'spark' occurrence, then a GREEDY leftmost
    // subsequence fold over the bounded slop window — list_reduce carries
    // the next-needed-token state as a string ('2' → '3' on a 'query'
    // hit); window end i + k + slop = i + 3 (1-based inclusive); an empty
    // slice folds to the init state and fails, so doc-tail anchors are
    // FALSE on both engines.
    "x42_ordered_near" ->
      s"""WITH m AS (SELECT doc_id, source, ${anTokSql("text")} AS toks
        |  FROM documents)
        |SELECT doc_id, source FROM m
        |WHERE len(list_filter(range(len(toks)), i ->
        |        toks[i+1] = 'spark' AND
        |        list_reduce(
        |          list_prepend('2', toks[(i+2) : least(i + 3, len(toks))]),
        |          (a, t) -> CASE WHEN a = '2' AND t = 'query' THEN '3'
        |                         ELSE a END) = '3')) > 0
        |ORDER BY doc_id""".stripMargin,

    // x47: x31's sliding-span construction (1-based starts, 8-token
    // slices, md5 keys) + token-granular anti-join; string_agg ORDER BY
    // pos rebuilds the identical survivor string; fully-excised docs
    // surface with empty cleaned_text via the LEFT JOIN + COALESCE.
    "x47_decontaminate" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        |           FROM documents),
        |tr AS (SELECT doc_id, toks FROM t WHERE source <> 'src9'),
        |sp AS (SELECT doc_id, CAST(i AS INT) AS start,
        |         md5(array_to_string(
        |           toks[CAST(i AS INT) : CAST(i + 7 AS INT)], ' ')) AS h
        |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
        |             FROM tr WHERE len(toks) >= 8)),
        |test AS (SELECT DISTINCT
        |           md5(array_to_string(
        |             toks[CAST(i AS INT) : CAST(i + 7 AS INT)], ' ')) AS h
        |         FROM (SELECT toks, unnest(range(1, len(toks) - 6)) AS i
        |               FROM t WHERE source = 'src9' AND len(toks) >= 8)),
        |cov AS (SELECT DISTINCT doc_id, start + CAST(j AS INT) AS pos
        |        FROM (SELECT sp.doc_id, sp.start, unnest(range(8)) AS j
        |              FROM sp JOIN test USING (h))),
        |tp AS (SELECT doc_id, CAST(generate_subscripts(toks, 1) AS INT)
        |           AS pos, unnest(toks) AS tok
        |       FROM tr),
        |kept AS (SELECT tp.doc_id, tp.pos, tp.tok
        |         FROM tp LEFT JOIN cov
        |           ON tp.doc_id = cov.doc_id AND tp.pos = cov.pos
        |         WHERE cov.pos IS NULL),
        |agg AS (SELECT doc_id, count(*) AS n_kept,
        |          string_agg(tok, ' ' ORDER BY pos) AS cleaned
        |        FROM kept GROUP BY 1)
        |SELECT tr.doc_id, len(tr.toks) AS n_tokens,
        |  len(tr.toks) - COALESCE(agg.n_kept, 0) AS n_dropped,
        |  COALESCE(agg.cleaned, '') AS cleaned_text
        |FROM tr LEFT JOIN agg USING (doc_id) ORDER BY tr.doc_id""".stripMargin,

    // x46: identical shard hash (x17's hex parse), (est_tokens DESC,
    // doc_id) is a total order so the round-robin is deterministic;
    // ceil→DOUBLE and window-sum→HUGEINT cast back to BIGINT.
    "x46_pack_bins" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT)
        |      % 8 AS shard
        |  FROM documents),
        |a AS (SELECT doc_id, est_tokens, shard,
        |    row_number() OVER (PARTITION BY shard
        |                       ORDER BY est_tokens DESC, doc_id) AS rn
        |  FROM d),
        |b AS (SELECT doc_id, shard, est_tokens,
        |    shard * 4 + CAST((rn - 1) % 4 AS INT) AS bin
        |  FROM a)
        |SELECT doc_id, shard, bin, est_tokens,
        |  CAST(SUM(est_tokens) OVER (PARTITION BY bin) AS BIGINT)
        |    AS bin_tokens,
        |  round(CAST(SUM(est_tokens) OVER (PARTITION BY bin) AS BIGINT)
        |        / 2048.0, 6) AS bin_fill
        |FROM b ORDER BY doc_id""".stripMargin,

    // x49: x46's shard hash + rank order, then the LPT fold as a
    // RECURSIVE CTE advancing every shard one rank per iteration,
    // carrying the 4 bin loads as a BIGINT list; the pick is
    // list_position(loads, list_min(loads)) — first-index tie-break,
    // exactly the native fold's argmin. All-integer, no drift possible.
    "x49_pack_lpt" ->
      """WITH RECURSIVE d AS (SELECT doc_id,
        |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT)
        |      % 8 AS shard
        |  FROM documents),
        |a AS (SELECT doc_id, est_tokens, shard,
        |    row_number() OVER (PARTITION BY shard
        |                       ORDER BY est_tokens DESC, doc_id) AS rn
        |  FROM d),
        |steps AS (
        |  SELECT shard, CAST(0 AS BIGINT) AS rn,
        |         CAST([0,0,0,0] AS BIGINT[]) AS loads,
        |         CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS INT) AS bin_local
        |  FROM (SELECT DISTINCT shard FROM a)
        |  UNION ALL
        |  SELECT a.shard, a.rn,
        |    list_transform(range(1, 5), j -> s.loads[CAST(j AS INT)] +
        |      CASE WHEN j = list_position(s.loads, list_min(s.loads))
        |           THEN a.est_tokens ELSE 0 END),
        |    a.doc_id,
        |    CAST(list_position(s.loads, list_min(s.loads)) - 1 AS INT)
        |  FROM steps s JOIN a ON a.shard = s.shard AND a.rn = s.rn + 1),
        |asg AS (SELECT doc_id, bin_local FROM steps WHERE doc_id IS NOT NULL),
        |b AS (SELECT a.doc_id, a.shard, a.est_tokens,
        |        a.shard * 4 + asg.bin_local AS bin
        |      FROM a JOIN asg USING (doc_id))
        |SELECT doc_id, shard, bin, est_tokens,
        |  CAST(SUM(est_tokens) OVER (PARTITION BY bin) AS BIGINT)
        |    AS bin_tokens,
        |  round(CAST(SUM(est_tokens) OVER (PARTITION BY bin) AS BIGINT)
        |        / 2048.0, 6) AS bin_fill
        |FROM b ORDER BY doc_id""".stripMargin,

    "x45_suggest" ->
      s"""WITH toks AS (SELECT doc_id, unnest(list_distinct(${anTokSql("text")}))
        |                AS term
        |              FROM documents)
        |SELECT term, count(*) AS df FROM toks WHERE term LIKE 'sp%'
        |GROUP BY 1 ORDER BY df DESC, term LIMIT 10""".stripMargin,

    // x44: identical MLT math — x15's qscore cut, x22's BM25 literal
    // structure per (doc, term), x24's round-then-DECIMAL-sum for the
    // order-free per-doc total.
    "x44_more_like_this" ->
      s"""WITH toks AS (SELECT doc_id, unnest(${anTokSql("text")}) AS term
        |              FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |lens AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS len
        |         FROM toks GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS sum_len FROM toks),
        |q AS (SELECT term, df FROM (
        |        SELECT tf.term, df.df,
        |          round(tf.tf * ln(n.n_docs / df.df), 6) AS qscore
        |        FROM tf JOIN df USING (term), n WHERE tf.doc_id = 0
        |        ORDER BY qscore DESC, tf.term LIMIT 3)),
        |sc AS (SELECT tf.doc_id,
        |         CAST(round(
        |           ln(1.0 + (n.n_docs - q.df + 0.5) / (q.df + 0.5))
        |           * (tf.tf * 2.2)
        |           / (tf.tf + 1.2 * (0.25 + 0.75 * lens.len
        |                             / (st.sum_len / n.n_docs))), 6)
        |              AS DECIMAL(28,12)) AS ts
        |       FROM tf JOIN q USING (term) JOIN lens USING (doc_id), n, st
        |       WHERE tf.doc_id <> 0),
        |agg AS (SELECT doc_id, CAST(sum(ts) AS DOUBLE) AS score
        |        FROM sc GROUP BY 1),
        |r AS (SELECT doc_id, score, CAST(row_number() OVER (
        |        ORDER BY score DESC, doc_id) AS INT) AS "rank"
        |      FROM agg WHERE score > 0)
        |SELECT doc_id, score, "rank" FROM r WHERE "rank" <= 10
        |ORDER BY "rank"""".stripMargin,

    // x48: identical typo-planting + messification, then the FuzzyProps-
    // pinned contract — any analyzed token within classic Levenshtein 1
    // of 'spark' (DuckDB's levenshtein is classic, like Spark's).
    "x48_fuzzy_match" ->
      s"""WITH c AS (SELECT doc_id, source,
        |    upper(replace(CASE WHEN doc_id % 3 = 0
        |                       THEN replace(text, 'spark', 'sprk')
        |                       ELSE text END, ' ', ', ')) AS text
        |  FROM documents),
        |m AS (SELECT doc_id, source, ${anTokSql("text")} AS toks FROM c)
        |SELECT doc_id, source FROM m
        |WHERE len(list_filter(toks, t -> levenshtein(t, 'spark') <= 1)) > 0
        |ORDER BY doc_id""".stripMargin,

    // x43: the same first-3-occurrences index scan (DuckDB range(1,n+1)
    // is 1-based like Spark's sequence(1,n); the [1:3] slice caps before
    // the unnest), generate_subscripts aligned with unnest for the
    // fragment index; ±2 window slice and per-token <em> wrap identical.
    "x43_highlight" ->
      s"""WITH m AS (SELECT doc_id, ${anTokSql("text")} AS toks
        |  FROM documents),
        |p AS (SELECT doc_id, toks,
        |        list_filter(range(1, len(toks) + 1),
        |                    i -> toks[i] = 'spark')[1:3] AS occs
        |      FROM m),
        |f AS (SELECT doc_id, toks,
        |        CAST(generate_subscripts(occs, 1) AS INT) AS fragment_idx,
        |        unnest(occs) AS pos
        |      FROM p)
        |SELECT doc_id, fragment_idx,
        |  array_to_string(list_transform(
        |    toks[CAST(greatest(1, pos - 2) AS INT)
        |         : CAST(least(len(toks), pos + 2) AS INT)],
        |    t -> CASE WHEN t = 'spark' THEN '<em>' || t || '</em>'
        |              ELSE t END), ' ') AS fragment
        |FROM f ORDER BY doc_id, fragment_idx""".stripMargin,

    // x40: the identical analyzer + consecutive-position check — range is
    // empty when the doc has fewer tokens than the phrase, so short docs
    // are FALSE on both engines.
    "x40_phrase_match" ->
      """WITH m AS (SELECT doc_id, source,
        |    list_filter(regexp_split_to_array(
        |        lower(upper(replace(text, ' ', ', '))), '[^a-z0-9]+'),
        |      t -> t <> '') AS toks
        |  FROM documents)
        |SELECT doc_id, source FROM m
        |WHERE len(list_filter(range(len(toks) - 1),
        |        i -> toks[i+1] = 'spark' AND toks[i+2] = 'query')) > 0
        |ORDER BY doc_id""".stripMargin
  )
}
