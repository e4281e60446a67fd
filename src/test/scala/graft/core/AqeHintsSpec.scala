package graft.core

import graft.SparkSpec

class AqeHintsSpec extends SparkSpec {

  private val Key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"

  "AqeHints.withTinyRowAdvisory" should
      "restore the caller's advisory after nested and overlapping wrappers" in {
    val before = spark.conf.getOption(Key)
    // nested: inner exit must NOT restore early
    AqeHints.withTinyRowAdvisory(spark) {
      AqeHints.withTinyRowAdvisory(spark) {
        spark.conf.get(Key) shouldBe "8m"
      }
      spark.conf.get(Key) shouldBe "8m" // still held by the outer wrapper
    }
    spark.conf.getOption(Key) shouldBe before

    // overlapping from two threads: the naive set/restore pair this
    // replaces let the second entrant save "8m" as its prev and leave
    // the advisory permanently altered after both exits
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val threads = (1 to 2).map { _ =>
      new Thread(() => AqeHints.withTinyRowAdvisory(spark) {
        gate.await() // both inside before either exits
        Thread.sleep(20)
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    spark.conf.getOption(Key) shouldBe before
  }

  it should "propagate body exceptions and still restore" in {
    val before = spark.conf.getOption(Key)
    an[IllegalStateException] should be thrownBy {
      AqeHints.withTinyRowAdvisory(spark) { throw new IllegalStateException("boom") }
    }
    spark.conf.getOption(Key) shouldBe before
  }
}
