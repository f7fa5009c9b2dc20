package graft.xml

import org.scalatest.funsuite.AnyFunSuite
import graft.config.{ExtractionConfig, ExtractionRule, XPathProjection}

class FragmentScannerSpec extends AnyFunSuite {

  private def rule(spec: String): ExtractionRule = ExtractionConfig.parseRule(spec, ";", "#")

  test("hasAttributes + includeChildren=false: start tag only + synthetic close") {
    val r = rule("book;true;false; ;0#//book/@id;")
    val doc = """<catalog><book id="bk101" s="3"><title>T</title></book></catalog>"""
    val frags = FragmentScanner.scan(doc, Vector(r))
    assert(frags.map(_.xml) == Vector("""<book id="bk101" s="3"></book>"""))
  }

  test("hasAttributes=false + includeChildren=true: whole subtree") {
    val r = rule("address;false;true; ;0#//address/phone/text();")
    val doc = "<store><address><phone>123</phone></address><other/></store>"
    val frags = FragmentScanner.scan(doc, Vector(r))
    assert(frags.map(_.xml) == Vector("<address><phone>123</phone></address>"))
  }

  test("elements nested inside an includeChildren fragment are swallowed (single pass)") {
    val a = rule("outer;false;true; ;0#//outer;")
    val b = rule("inner;false;true; ;1#//inner;")
    val doc = "<outer><inner>x</inner></outer><inner>y</inner>"
    val frags = FragmentScanner.scan(doc, Vector(a, b))
    // first inner is consumed by the outer fragment's buffer; second survives
    assert(frags.map(f => (f.ruleIndex, f.xml)) == Vector(
      (0, "<outer><inner>x</inner></outer>"), (1, "<inner>y</inner>")))
  }

  test("elements after an includeChildren=false start tag are still scanned") {
    val inv = rule("inventory;true;false; ;0#//inventory/@month;")
    val book = rule("book;true;false; ;1#//book/@id;")
    val doc = """<inventory month="Jan"><books><book id="bk101" n="1"></book></books></inventory>"""
    val frags = FragmentScanner.scan(doc, Vector(inv, book))
    assert(frags.map(_.ruleIndex) == Vector(0, 1))
  }

  test("required attribute is a raw substring match: bk1 matches bk101..bk112") {
    val r = rule("book;true;false;bk1;0#//book/@id;")
    val doc = """<c><book id="bk101" n="1"></book><book id="xk999" n="2"></book><book id="bk112" n="3"></book></c>"""
    val frags = FragmentScanner.scan(doc, Vector(r))
    assert(frags.map(_.xml) == Vector(
      """<book id="bk101" n="1"></book>""", """<book id="bk112" n="3"></book>"""))
  }

  test("rejected filter skips the candidate but scanning continues after it") {
    val r = rule("book;true;false;bk106;0#//book/@id;")
    val doc = """<c><book id="bk105" n="1"></book><book id="bk106" n="2"></book></c>"""
    val frags = FragmentScanner.scan(doc, Vector(r))
    assert(frags.map(_.xml) == Vector("""<book id="bk106" n="2"></book>"""))
  }

  test("filter window is the start tag only, not the children") {
    val r = rule("book;true;true;bk106;0#//book/@id;")
    // 'bk106' appears only in the child text — the start-tag window must reject it
    val doc = """<c><book id="bk105"><note>bk106</note></book></c>"""
    assert(FragmentScanner.scan(doc, Vector(r)).isEmpty)
  }

  test("seq is strictly increasing and equals position after the end match") {
    val r = rule("b;true;false; ;0#//b/@x;")
    val doc = """<b x="1"></b><b x="2"></b>"""
    val frags = FragmentScanner.scan(doc, Vector(r))
    assert(frags.map(_.seq) == frags.map(_.seq).sorted)
    assert(frags(0).seq == doc.indexOf('>') + 1)
  }

  test("unclosed fragment at end of stream is dropped") {
    val r = rule("a;false;true; ;0#//a;")
    val doc = "<a>unclosed forever"
    assert(FragmentScanner.scan(doc, Vector(r)).isEmpty)
  }

  test("full inventory config over the Soho document finds 1+1+2+11 fragments") {
    def res(name: String): String = {
      val src = scala.io.Source.fromInputStream(getClass.getResourceAsStream(s"/$name"), "UTF-8")
      try src.mkString finally src.close()
    }
    val config = ExtractionConfig.fromXml(res("ExtractInventory.xml"))
    val frags = FragmentScanner.scan(res("InventorySoho.xml"), config.rules.toIndexedSeq)
    val byRule = frags.groupBy(_.ruleIndex).view.mapValues(_.size).toMap
    assert(byRule == Map(0 -> 1, 1 -> 1, 2 -> 2, 3 -> 11))
  }
}
