package graft.sources.rest

import org.scalacheck.{Gen, Prop, Properties}

/** Injection-safety law for the REST query-fragment builder. */
object SoqlProps extends Properties("graft.sources.rest.Soql") {

  // For ANY string, the rendered literal is one single-quoted token
  // whose interior never terminates the quote — every interior ' is
  // preceded by an odd run of backslashes.
  property("lit never lets a string break out of its quotes") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val lit = Soql.lit(s)
      def interiorQuoteEscaped(t: String): Boolean = {
        var i = 1; var ok = true
        while (i < t.length - 1) {
          if (t(i) == '\'') {
            var bs = 0; var j = i - 1
            while (j >= 1 && t(j) == '\\') { bs += 1; j -= 1 }
            if (bs % 2 == 0) ok = false
          }
          i += 1
        }
        ok
      }
      lit.head == '\'' && lit.last == '\'' && interiorQuoteEscaped(lit)
    }
}
