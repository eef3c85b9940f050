package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Kernels

/** `normalizeClean` kernel: the planted edges the (NFC-clean) fixture
  * can't exercise -- decomposed Unicode recomposition, control-char
  * stripping, trim semantics, and the no-allocation ASCII fast path.
  * Non-ASCII codepoints are built from escapes so the fixture cannot
  * be silently re-normalized by tooling. Corpus-level byte parity vs
  * DuckDB's independent utf8proc NFC runs in the `q_text_clean`
  * oracle. */
class TextCleanSpec extends AnyFunSuite {

  private def clean(s: String): String =
    Kernels.normalizeClean(UTF8String.fromString(s)).toString

  test("decomposed NFD sequences recompose to NFC") {
    // e + COMBINING ACUTE ACCENT (U+0301) -> U+00E9
    assert(clean("cafe" + "\u0301") == "caf" + "\u00e9")
    // A + COMBINING RING ABOVE (U+030A) -> U+00C5
    assert(clean("A" + "\u030a" + "ngstro" + "\u0308" + "m") ==
      "\u00c5" + "ngstr" + "\u00f6" + "m")
  }

  test("C0/C1 controls stripped; newline and tab survive") {
    assert(clean("a" + "\u0001" + "bc") == "abc")
    assert(clean("a" + "\r" + "b") == "ab") // carriage return is stripped
    assert(clean("a" + "\n" + "b" + "\t" + "c") == "a" + "\n" + "b" + "\t" + "c")
    assert(clean("a" + "\u009c" + "bc") == "abc") // C1 range
  }

  test("trim removes leading/trailing space, newline, tab -- only") {
    assert(clean("  hello  ") == "hello")
    assert(clean("\n" + "\t" + "hello" + "\t" + "\n") == "hello")
    assert(clean("he  llo") == "he  llo") // interior untouched
    assert(clean("") == "")
    assert(clean(" " + "\n" + "\t" + " ") == "")
  }

  test("clean ASCII takes the identity fast path (same object out)") {
    val in = UTF8String.fromString("already clean ascii text")
    assert(Kernels.normalizeClean(in) eq in)
    // non-ASCII but already NFC: value-equal after the slow path
    assert(clean("caf" + "\u00e9") == "caf" + "\u00e9")
  }

  test("strip-then-normalize: a control between base and combiner") {
    // U+0007 sits between 'e' and the combining accent; stripping it
    // FIRST lets NFC recompose (the oracle's documented order)
    assert(clean("cafe" + "\u0007" + "\u0301") == "caf" + "\u00e9")
  }
}
