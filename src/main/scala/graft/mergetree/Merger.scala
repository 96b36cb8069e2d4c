package graft.mergetree

/** Merge-candidate selection (O17), ported semantically from the reference
  * (src/merger.cpp:84-130 select_merge_candidates;
  * src/merger.cpp:140-174 calculate_merge_score).
  *
  * Scoring formula, kept verbatim for fidelity:
  *   score = (min_size / max_size) × (1 / n_parts)
  *           × min(1, total_size / 10 MiB) × 100
  *
  * Enumeration order matters: pairs (i,j) with i<j, then consecutive
  * triples (i, i+1, i+2), truncated at `maxCandidates` DURING generation —
  * the reference passes max_candidates=1 from perform_merge
  * (src/merge_tree.cpp:255), so the effective policy is "merge the first
  * pair with positive score". We reproduce that, including the truncation
  * quirk.
  */
object Merger {

  final case class MergeCandidate(parts: List[PartMetadata], score: Double)

  def calculateMergeScore(selected: Seq[PartMetadata]): Double = {
    if (selected.isEmpty) return 0.0
    val sizes = selected.map(_.diskSize)
    val totalRows = selected.map(_.rowCount).sum
    val totalSize = sizes.sum
    if (totalRows == 0 || totalSize == 0) return 0.0
    val sizeRatio = sizes.min.toDouble / sizes.max.toDouble
    val partsFactor = 1.0 / selected.size
    val sizeFactor = math.min(1.0, totalSize.toDouble / (10L * 1024 * 1024))
    sizeRatio * partsFactor * sizeFactor * 100.0
  }

  def selectCandidates(parts: Seq[PartMetadata], maxCandidates: Int): List[MergeCandidate] = {
    val out = scala.collection.mutable.ListBuffer.empty[MergeCandidate]
    if (parts.size < 2) return Nil
    val n = parts.size
    var i = 0
    while (i < n && out.size < maxCandidates) {
      var j = i + 1
      while (j < n && out.size < maxCandidates) {
        val sel = List(parts(i), parts(j))
        val s = calculateMergeScore(sel)
        if (s > 0) out += MergeCandidate(sel, s)
        j += 1
      }
      i += 1
    }
    i = 0
    while (n >= 3 && i < n - 2 && out.size < maxCandidates) {
      val sel = List(parts(i), parts(i + 1), parts(i + 2))
      val s = calculateMergeScore(sel)
      if (s > 0) out += MergeCandidate(sel, s)
      i += 1
    }
    out.toList.sortBy(-_.score)
  }

  /** The policy actually used by the engine: best (first) candidate or
    * none (src/merge_tree.cpp:251-259).
    */
  def selectMergeCandidates(parts: Seq[PartMetadata]): Option[List[PartMetadata]] =
    selectCandidates(parts, maxCandidates = 1).headOption.map(_.parts)
}
