package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.RegistryBridge
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL registration of graft's native expressions — the pure-SQL doorway to
  * the kernel tier: after [[GraftFunctions.registerAll]] (existing session)
  * or building the session `.withExtensions(new GraftExtensions)`, every
  * kernel is callable from `spark.sql(...)` exactly like a built-in:
  *
  * {{{
  *   SELECT graft_simhash32(text)        FROM docs
  *   SELECT graft_minhash_sig(text, 3)   FROM docs
  *   SELECT graft_iceberg_bucket(id, 16) FROM t    -- Iceberg spec murmur3
  * }}}
  *
  * Everything stays a native codegen'd `Expression` — SQL naming adds no
  * UDF/serialization overhead, and the functions participate in whole-stage
  * codegen like any built-in.
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private def expect(n: Int, fn: String)(args: Seq[Expression]): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** (name, builder) for every exposed kernel. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_portable_hash" -> { args =>
      expect(1, "graft_portable_hash")(args)
      TextKernel(args.head, "portableHash", LongType)
    },
    "graft_fingerprint" -> { args =>
      expect(1, "graft_fingerprint")(args)
      TextKernel(args.head, "fingerprint", LongType)
    },
    "graft_simhash16" -> { args =>
      expect(1, "graft_simhash16")(args)
      TextKernel(args.head, "simhash16", LongType)
    },
    "graft_simhash32" -> { args =>
      expect(1, "graft_simhash32")(args)
      TextKernel(args.head, "simhash32", LongType)
    },
    "graft_rep_stats" -> { args =>
      expect(1, "graft_rep_stats")(args)
      RepStats(args.head)
    },
    "graft_checksum" -> { args =>
      expect(1, "graft_checksum")(args)
      BinaryChecksum(args.head)
    },
    "graft_minhash_sig" -> { args =>
      expect(2, "graft_minhash_sig")(args)
      MinhashSig(args.head, intArg(args(1), "graft_minhash_sig", 2))
    },
    "graft_shingle_count" -> { args =>
      expect(2, "graft_shingle_count")(args)
      ShingleKernel(args.head, intArg(args(1), "graft_shingle_count", 2))
    },
    "graft_shingle_hashes" -> { args =>
      expect(2, "graft_shingle_hashes")(args)
      ShingleHashes(args.head, intArg(args(1), "graft_shingle_hashes", 2))
    },
    "graft_word_shingles" -> { args =>
      expect(2, "graft_word_shingles")(args)
      WordShingles(args.head, intArg(args(1), "graft_word_shingles", 2))
    },
    "graft_shingle_common" -> { args =>
      expect(3, "graft_shingle_common")(args)
      ShingleCommon(args.head, args(1), intArg(args(2), "graft_shingle_common", 3))
    },
    "graft_sorted_common" -> { args =>
      expect(2, "graft_sorted_common")(args)
      SortedLongCommon(args.head, args(1))
    },
    "graft_dot" -> { args =>
      expect(2, "graft_dot")(args)
      DotFold(args.head, args(1))
    },
    "graft_quantize_int8" -> { args =>
      expect(1, "graft_quantize_int8")(args)
      QuantizeInt8(args.head)
    },
    "graft_iceberg_bucket" -> { args =>
      expect(2, "graft_iceberg_bucket")(args)
      IcebergBucket(args.head, intArg(args(1), "graft_iceberg_bucket", 2))
    },
    "graft_interleave_bits" -> { args =>
      args.size match {
        case 2 => InterleaveBits(args.head, args(1))
        case 3 => InterleaveBits3(args.head, args(1), args(2))
        case 4 => InterleaveBits4(args.head, args(1), args(2), args(3))
        case n => throw new IllegalArgumentException(
          s"graft_interleave_bits takes 2 to ${ZOrder.MaxDims} arguments, got $n")
      }
    })

  private def infoFor(name: String): ExpressionInfo =
    new ExpressionInfo(GraftFunctions.getClass.getCanonicalName, name)

  /** Register every kernel on an existing session's function registry. */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      RegistryBridge.register(spark, name, infoFor(name), builder)
    }

  /** The extensions-path registrations, shared with [[graft.plans.GraftExtensions]]. */
  private[graft] def injectInto(
      ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      ext.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          infoFor(name), builder))
    }
}
