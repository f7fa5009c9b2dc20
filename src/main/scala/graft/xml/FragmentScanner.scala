package graft.xml

import graft.config.ExtractionRule

/**
 * One extracted XML fragment.
 *
 * @param ruleIndex index of the [[ExtractionRule]] that admitted the fragment
 * @param seq       document-stream position of the fragment (position just past the
 *                  end-pattern match — mirrors the reference's `token.currentPos` at emit,
 *                  `SeqXmlRecordReader.java:189`); strictly increasing within a document,
 *                  so it defines document order for the fill-down pivot
 * @param xml       the assembled fragment: matched start tag + buffered body +
 *                  synthetic close when `includeChildren = false`
 *                  (`SeqXmlRecordReader.java:185-187`)
 */
final case class Fragment(ruleIndex: Int, seq: Long, xml: String)

/**
 * Single-pass multi-rule XML fragment scanner — the semantic re-implementation of the
 * reference's byte-stream record reader (`SeqXmlRecordReader.java:162-328`).
 *
 * Semantics reproduced exactly:
 *  - one forward pass; while a fragment is being buffered no other rule can match, so
 *    fragments never overlap and configured elements nested inside an
 *    `includeChildren = true` fragment are swallowed, while elements after an
 *    `includeChildren = false` start tag are still scanned;
 *  - the required-attribute test is a raw *substring* match over the bytes between the
 *    start-tag match and the first `>` (`SeqXmlRecordReader.java:262-272`) — `bk1`
 *    matches `bk101`..`bk112`;
 *  - on a rejected filter the whole candidate region (through the end-pattern match) is
 *    skipped (`IGNORE_TAG`, `SeqXmlRecordReader.java:283-305`);
 *  - when several rules match the same start position, the end pattern comes from the
 *    highest-index rule (`matchIndex.peek()`, `:278`) and the emitted rule is the lowest
 *    index whose filter passes (stack iteration order, `:283-295`).
 *
 * Deliberately NOT reproduced (documented reference defects, SURVEY.md §2.10 #4-#5):
 * the naive matcher's missed overlapping prefixes and its lack of nesting-depth
 * tracking. We use exact `indexOf` search, which is strictly more correct on
 * well-formed input and byte-equal on the reference's own test corpus.
 */
object FragmentScanner {

  def scan(doc: String, rules: IndexedSeq[ExtractionRule]): Vector[Fragment] = {
    val out = Vector.newBuilder[Fragment]
    val starts = rules.map(_.startPattern)
    var pos = 0
    while (pos < doc.length) {
      val lt = doc.indexOf('<', pos)
      if (lt < 0) { pos = doc.length }
      else {
        // all rules whose start pattern matches here, in rule order
        var matched = List.empty[Int]
        var i = rules.length - 1
        while (i >= 0) {
          if (doc.startsWith(starts(i), lt)) matched = i :: matched
          i -= 1
        }
        if (matched.isEmpty) { pos = lt + 1 }
        else {
          val startEnd = lt + starts(matched.head).length
          // end pattern from the highest-index matching rule (reference peek())
          val endRule = rules(matched.last)
          val endIdx = doc.indexOf(endRule.endPattern, startEnd)
          if (endIdx < 0) { pos = doc.length } // END_OF_STREAM: unclosed fragment dropped
          else {
            val fragEnd = endIdx + endRule.endPattern.length
            // attribute-filter window: after the start match, up to the first '>'
            // (or the end match, whichever comes first)
            val tagClose = doc.indexOf('>', startEnd)
            val windowEnd = if (tagClose < 0) fragEnd else math.min(tagClose, fragEnd)
            lazy val window = doc.substring(startEnd, math.max(startEnd, windowEnd))
            val emit = matched.find { ri =>
              rules(ri).requiredAttrSubstring.forall(window.contains)
            }
            emit.foreach { ri =>
              val rule = rules(ri)
              val xml = rule.startPattern + doc.substring(startEnd, fragEnd) + rule.bufferAddition
              out += Fragment(ri, fragEnd.toLong, xml)
            }
            pos = fragEnd
          }
        }
      }
    }
    out.result()
  }
}
