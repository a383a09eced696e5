package graft.ops

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Partitioning invariance: the operators whose algorithms are
  * ORDER-SENSITIVE (prefix sums, sequential folds, iterative
  * contractions) must still produce identical bits when the input
  * split sizes and shuffle fan-out change — that's the property that
  * lets the sf0.1 local result stand in for a 1000-executor run.
  * Perturbing `files.maxPartitionBytes` (scan splits) and
  * `shuffle.partitions` (every exchange) exercises both boundaries.
  */
class InvarianceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // sorted Seq, not Set: a perturbation that duplicates or drops one
  // of two identical rows must fail the comparison
  private def collectSet(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def withPerturbedPartitioning[A](body: => A): A = {
    val conf = spark.conf
    val oldShuffle = conf.get("spark.sql.shuffle.partitions")
    val oldMax = conf.getOption("spark.sql.files.maxPartitionBytes")
    val oldCost = conf.getOption("spark.sql.files.openCostInBytes")
    conf.set("spark.sql.shuffle.partitions", "7")
    conf.set("spark.sql.files.maxPartitionBytes", "65536")
    conf.set("spark.sql.files.openCostInBytes", "0")
    try body
    finally {
      conf.set("spark.sql.shuffle.partitions", oldShuffle)
      oldMax.fold(conf.unset("spark.sql.files.maxPartitionBytes"))(
        v => conf.set("spark.sql.files.maxPartitionBytes", v))
      oldCost.fold(conf.unset("spark.sql.files.openCostInBytes"))(
        v => conf.set("spark.sql.files.openCostInBytes", v))
    }
  }

  private val cases: Seq[(String, () => DataFrame)] = Seq(
    ("q59 sequence packing (two-phase prefix sum)",
      () => Packing.q59SequencePack(spark, TestSpark.sfDir)),
    ("q61 funnel (per-user sorted fold)",
      () => Sessions.q61Funnel(spark, TestSpark.sfDir)),
    ("q37 k-means (sorted-fold centroid updates)",
      () => SimilarityOps.q37KmeansIvf(spark, TestSpark.sfDir)),
    ("q33 connected components (star contraction)",
      () => DedupOps.q33DedupClusters(spark, TestSpark.sfDir)),
    ("q1 exact fixed-point aggregation",
      () => Relational.q1Agg(spark, TestSpark.sfDir)),
    ("q54 distributed global ntile (two-phase rank)",
      () => Extended.q54MovingWindow(spark, TestSpark.sfDir)),
    ("q69 distributed per-group percentile rank",
      () => Extended.q69PercentileCont(spark, TestSpark.sfDir)),
    ("q48 distributed nearest-rank length profile",
      () => Curation.q48LengthProfile(spark, TestSpark.sfDir)),
    ("q45 stratified sample (two-phase hash rank)",
      () => Curation.q45StratifiedSample(spark, TestSpark.sfDir)),
    ("q78 shard assignment (global two-phase rank)",
      () => Packing.q78ShardAssign(spark, TestSpark.sfDir)),
    ("q93 BPE encode (driver-iterated training + fold chain)",
      () => TextOps.q93BpeEncode(spark, TestSpark.sfDir)),
    ("q95 median quality gate (two-phase global rank threshold)",
      () => Curation.q95QualityGate(spark, TestSpark.sfDir)),
    ("q96 group regression (exact decimal moments)",
      () => Audit.q96GroupRegression(spark, TestSpark.sfDir)),
    ("q88 TF-IDF similarity (integer dot/norm arithmetic)",
      () => TextOps.q88TfidfSimilar(spark, TestSpark.sfDir)),
    ("q105 concurrency sweep (bucketed global prefix sum)",
      () => Sweep.q105Concurrency(spark, TestSpark.sfDir)),
    ("q106 Pareto frontier (bucketed exclusive running max)",
      () => Sweep.q106ParetoFrontier(spark, TestSpark.sfDir)),
    ("q108 k-core (fixed-round window-count peeling)",
      () => Graph.q108KCore(spark, TestSpark.sfDir)),
    ("q111 table checksum (XOR content monoid)",
      () => Integrity.q111TableChecksum(spark, TestSpark.sfDir)),
    ("q116 token association (chi2 double ranking)",
      () => TextOps.q116TokenAssoc(spark, TestSpark.sfDir)),
    ("q117 weighted median (per-group prefix-sum threshold)",
      () => Extended.q117WeightedMedian(spark, TestSpark.sfDir)),
    ("q119 bootstrap replicates (hash-derived resampling)",
      () => Curation.q119BootstrapCi(spark, TestSpark.sfDir)),
    ("q121 event paths (array_sort-restored session order)",
      () => Sessions.q121EventPaths(spark, TestSpark.sfDir)),
    ("q122 BFS reachability (iterative frontier expansion)",
      () => Graph.q122Reachability(spark, TestSpark.sfDir)),
    ("q123 shortest path (iterative min-plus relaxation)",
      () => Graph.q123ShortestPath(spark, TestSpark.sfDir)),
    ("q125 cumulative users (bucketed global prefix sum)",
      () => Sessions.q125CumulativeUsers(spark, TestSpark.sfDir)),
    ("q126 attribution (conditional ignore-nulls window fold)",
      () => Sessions.q126Attribution(spark, TestSpark.sfDir)),
    ("q134 spatial radius join (grid-blocked pair generation)",
      () => Spatial.q134SpatialJoin(spark, TestSpark.sfDir)),
    ("q136 PMI collocations (tie-broken TakeOrdered top-20)",
      () => TextOps.q136PmiCollocations(spark, TestSpark.sfDir)),
    ("q140 Gini (two-phase rank-weighted exact sum)",
      () => Audit.q140Gini(spark, TestSpark.sfDir)),
    ("q144 partition planner (rank-local boundary filter)",
      () => Layout.q144PartitionPlan(spark, TestSpark.sfDir)),
    ("q145 winsorized stats (two-phase nearest-rank bounds)",
      () => Audit.q145Winsorized(spark, TestSpark.sfDir)),
    ("q151 quantile normalization (two two-phase ranks + rank join)",
      () => Audit.q151QuantileNorm(spark, TestSpark.sfDir)),
    ("q152 exact AUC (value-grouped prefix ranks)",
      () => Audit.q152Auc(spark, TestSpark.sfDir)),
    ("q156 KMV sketch (two-phase min-k rank + sorted register)",
      () => Kmv.q156KmvSketch(spark, TestSpark.sfDir)),
    ("q157 KMV set ops (pair-merged sketch ranking)",
      () => Kmv.q157KmvSetops(spark, TestSpark.sfDir)),
    ("q158 survivorship (min-struct attribute modes over CC labels)",
      () => DedupOps.q158Survivorship(spark, TestSpark.sfDir)),
    ("q162 token budget (global prefix-sum water-filling)",
      () => Curation.q162TokenBudget(spark, TestSpark.sfDir)),
    ("q164 sort advisor (three bucketed global rank layouts)",
      () => Layout.q164SortAdvisor(spark, TestSpark.sfDir)),
    ("q176 TV drift (cross-multiplied integer binned distance)",
      () => Audit.q176TvDrift(spark, TestSpark.sfDir)),
    ("q177 containment pairs (prefix-blocked smaller-side join)",
      () => DedupOps.q177Containment(spark, TestSpark.sfDir)),
    ("q178 systematic PPS sample (bucketed global prefix sum)",
      () => Curation.q178SystematicSample(spark, TestSpark.sfDir)),
    ("q179 vocab coverage curve (type-frame rank + prefix sum)",
      () => TextOps.q179VocabCoverage(spark, TestSpark.sfDir)),
    ("q180 kNN label eval (bounded top-k + min-struct vote)",
      () => SimilarityOps.q180KnnLabelEval(spark, TestSpark.sfDir)),
    ("q181 source centroid drift (integer-quantized centroid sums)",
      () => SimilarityOps.q181SourceCentroidDrift(spark, TestSpark.sfDir)),
    ("q182 BM25 top-k (integer-ppm scores, bounded top-k)",
      () => TextOps.q182Bm25TopK(spark, TestSpark.sfDir)),
    ("q183 percentile-rank normalization (value-grouped prefix counts)",
      () => Audit.q183PercentileRank(spark, TestSpark.sfDir)),
    ("q184 token drift movers (tie-broken TakeOrdered)",
      () => TextOps.q184TokenDrift(spark, TestSpark.sfDir)),
    ("q185 seasonal-naive error (hourly-aggregate self-joins)",
      () => Audit.q185SeasonalError(spark, TestSpark.sfDir)),
    ("q186 basket diversity (exact rational Gini-Simpson)",
      () => Relational.q186BasketDiversity(spark, TestSpark.sfDir)),
    ("q187 media pHash near-dup (banded LSH + multi-band distinct)",
      () => MultimodalOps.q187MediaPhash(spark, TestSpark.sfDir)),
    ("q188 leakage-safe split (cluster-keyed hash split)",
      () => Curation.q188LeakageSplit(spark, TestSpark.sfDir)),
    ("q189 MMR diversified retrieval (per-query sequential greedy)",
      () => SimilarityOps.q189MmrDiverse(spark, TestSpark.sfDir)),
    ("q190 IVF-PQ search (probe prune + subspace-ordered ADC fold)",
      () => SimilarityOps.q190IvfPqSearch(spark, TestSpark.sfDir)),
    ("q191 ACF (dense-grid lag joins, decimal moments)",
      () => Audit.q191Acf(spark, TestSpark.sfDir)),
    ("q192 encoding advisor (keyed run windows over a melt)",
      () => Layout.q192EncodingAdvisor(spark, TestSpark.sfDir)),
    ("q193 modularity (label join over persisted LPA edges)",
      () => Graph.q193Modularity(spark, TestSpark.sfDir)),
    ("q194 DBSCAN (grid-blocked neighbors + star contraction)",
      () => Spatial.q194Dbscan(spark, TestSpark.sfDir)),
    ("q195 HITS (max-rescaled integer power iteration)",
      () => Graph.q195Hits(spark, TestSpark.sfDir)),
    ("q196 audio VAD segmentation (gaps-and-islands runs)",
      () => MultimodalOps.q196AudioVad(spark, TestSpark.sfDir)),
    ("q197 retractable IVM (signed-delta full-outer merge)",
      () => ChangeFeed.q197RetractAgg(spark, TestSpark.sfDir)),
    ("q199 bitmap index (bit_or packed words + popcount algebra)",
      () => BitmapIndex.q199BitmapIndex(spark, TestSpark.sfDir)),
    ("q201 join cardinality estimator (per-cell distinct counts)",
      () => Audit.q201JoinCardEst(spark, TestSpark.sfDir)),
    ("q203 preference pairs (two-phase rank positional match)",
      () => Curation.q203PreferencePairs(spark, TestSpark.sfDir)),
    ("q205 time-weighted average (rank-joined successor durations)",
      () => Audit.q205TimeWeightedAvg(spark, TestSpark.sfDir)),
    ("q206 column NDV (melt + KMV smallest-k per column)",
      () => Kmv.q206ColumnNdv(spark, TestSpark.sfDir)),
    ("q209 min-cost supplier (argmin join with suppkey tie-break)",
      () => Classic.q209MinCostSupplier(spark, TestSpark.sfDir)),
    ("q214 temperature mix (largest-remainder apportionment ties)",
      () => Curation.q214TemperatureMix(spark, TestSpark.sfDir)),
    ("q216 k-center coreset (iterative argmax with min-id ties)",
      () => SimilarityOps.q216KcenterCoreset(spark, TestSpark.sfDir)),
    ("q218 recursive hierarchy rollup (WITH RECURSIVE closure)",
      () => SqlOps.q218RecursiveRollup(spark, TestSpark.sfDir)),
    ("q219 lateral top-k (decorrelated ranking, total order)",
      () => SqlOps.q219LateralTopk(spark, TestSpark.sfDir)),
    ("q220 Kaplan-Meier (recursive truncating product fold)",
      () => SqlOps.q220KaplanMeier(spark, TestSpark.sfDir)),
    ("q221 weighted sample (min-of-w hashes + TakeOrdered)",
      () => Curation.q221WeightedSample(spark, TestSpark.sfDir)),
    ("q222 conformal intervals (two-phase calibration rank)",
      () => Audit.q222ConformalInterval(spark, TestSpark.sfDir)),
    ("q225 clamped balance (non-associative sorted fold)",
      () => Sessions.q225ClampedBalance(spark, TestSpark.sfDir)),
    ("q228 hard negatives (trained-cell block + struct-max argmax)",
      () => SimilarityOps.q228HardNegatives(spark, TestSpark.sfDir)),
    ("q229 Holt trend (grouped order-sensitive integer fold)",
      () => Trend.q229HoltTrend(spark, TestSpark.sfDir)),
    ("q231 RFM segments (three global prefix-sum quintiles)",
      () => Classic.q231RfmSegments(spark, TestSpark.sfDir)),
    ("q234 isotonic calibration (single-group PAV stack scan)",
      () => Causal.q234IsotonicCalibration(spark, TestSpark.sfDir)),
    ("q240 band join (bucketed keyless range equi-join)",
      () => BandJoin.q240BandJoin(spark, TestSpark.sfDir)),
    ("q243 Theil-Sen slope (two-phase rank lower median of pair slopes)",
      () => Trend.q243TheilSen(spark, TestSpark.sfDir)),
    ("q244 Nelson-Aalen (risk-set countdown + hazard prefix fold)",
      () => SqlOps.q244NelsonAalen(spark, TestSpark.sfDir)),
    ("q245 lagged cross-covariance (zero-filled grid lag joins)",
      () => Trend.q245CrossCov(spark, TestSpark.sfDir)),
    ("q246 personalized PageRank (integer teleport power iteration)",
      () => Graph.q246PersonalizedPagerank(spark, TestSpark.sfDir)),
    ("q247 forward as-of (union-trick descending window)",
      () => AsOfJoin.q247ForwardAsof(spark, TestSpark.sfDir)),
    ("q249 Holt-Winters (26-long seasonal state, order-sensitive fold)",
      () => Trend.q249HoltWinters(spark, TestSpark.sfDir)))

  for ((name, mk) <- cases) {
    test(s"$name is bit-identical under perturbed partitioning") {
      val base = collectSet(mk())
      val perturbed = withPerturbedPartitioning(collectSet(mk()))
      assert(base.nonEmpty && perturbed == base)
    }
  }
}
