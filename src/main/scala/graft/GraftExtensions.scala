package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{ArraySetFunctions, PackedVectorFunctions, SignatureFunctions, TextHashFunctions, VectorFunctions}

/** Engine extension pack, installed with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (wired in
  * GraftSession) or `spark.sql.extensions=graft.GraftExtensions`.
  * Registers the engine's native expressions so they are first-class in
  * SQL text as well as the Column API — the extension seam where future
  * custom rules/strategies would plug in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(VectorFunctions.vecDotLongDescriptor)
    e.injectFunction(PackedVectorFunctions.vecPackU8Descriptor)
    e.injectFunction(PackedVectorFunctions.vecDotU8LongDescriptor)
    e.injectFunction(TextHashFunctions.wordHash40Descriptor)
    e.injectFunction(SignatureFunctions.minHash12Descriptor)
    e.injectFunction(SignatureFunctions.simHash32Descriptor)
    e.injectFunction(SignatureFunctions.shingleHash40Descriptor)
    e.injectFunction(ArraySetFunctions.sortedIntersectLongDescriptor)
  }
}
