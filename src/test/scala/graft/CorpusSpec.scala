package graft

import graft.sql.GraftSql
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** VERBATIM replay of the reference's full real-query corpus
  * (testes-sqls.txt:1-232 — SQL queries 1-6 plus examples 1-12, every
  * distinct query, unmodified text) against an F8-style fixture
  * (FIXTURES.md: Brazilian PIS/COFINS schema — double-quoted/backticked
  * identifiers with spaces, accents, parens, slashes). Every query must
  * parse and run through the dialect shim with the expected shape.
  */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 21 columns — every identifier the corpus mentions, including the
    * distinct "Tipo de Crédito" vs "Tipo Crédito" pair Query 6 needs. */
  def fixture(): DataFrame = {
    val df = Seq(
      ("111", 2024, 4, "dezembro", "PAC 12345678 2019.01", "Ressarcimento", "R1", "Saldo credor", 55, Option(1.65), 11700.0, 10.0, 20.0, 30.0, 60.0, 5.0, 100.0, 40.0, 41.0, "PERD1", "entrada"),
      ("222", 2024, 4, "Dez",      "PAC 12345678 2020.02", "Compensação",   "R2", "Outros",       60, Option(0.65), 234.0,   1.0,  2.0,  3.0,  6.0, 0.5,  50.0,  20.0, 21.0, "PERD2", "Entrada de insumo"),
      ("Saldo X", 2023, 1, "jan",  "PAC 12345678 2021.03", "Ressarcimento", "R3", null,           40, Option.empty[Double], 117.0, 0.0, 0.0, 0.0, 0.0, 0.0, 25.0, 10.0, 11.0, "PERD3", "saida"),
      (null, 2024, 2, "",          "PAC 12345678 2019.04", "Dedução",       "R4", "Saldo devedor", 66, Option(1.65), 351.0,  5.0,  6.0,  7.0, 18.0, 1.0,  75.0,  30.0, 31.0, "PERD4", "ENTRADA")
    ).toDF(
      "CNPJ Base", "Ano do Período de Apuração", "Trimestre do Período de Apuração",
      "Mês do Período de Apuração", "Período Apuração Crédito",
      "Tipo de Crédito", "Tipo Crédito",
      "Natureza da Base de Cálculo dos Créditos", "Código de Situação Tributária (CST)",
      "Alíquota de PIS/PASEP (em percentual)", "Valor da Base de Cálculo das Contribuições",
      "Crédito vinculado à Receita Bruta Não Cumulativa: Tributada",
      "Crédito vinculado à Receita Bruta Não Cumulativa: Não Tributada",
      "Crédito vinculado à Receita Bruta Não Cumulativa: de Exportação",
      "Crédito vinculado à Receita Bruta Não Cumulativa",
      "Crédito vinculado à Receita Bruta Cumulativa (Valores Excluídos)",
      "Crédito vinculado à Receita Bruta Total",
      "Valor Total Crédito", "Valor Crédito Data Transmissão",
      "PER/DCOMP", "Tipo de Operação")
    df.createOrReplaceTempView("AllData")
    df
  }

  val NCols = 21

  def run(q: String): DataFrame = { fixture(); GraftSql.run(spark, q.stripSuffix(";")) }

  test("corpus query 1 / example 1: SELECT *") {
    assert(run("SELECT * FROM AllData;").count() == 4)
  }

  test("corpus query 2: 10-column projection, case-sensitive LIKE (testes-sqls.txt:5)") {
    val out = run(
      """SELECT
        |    "Ano do Período de Apuração",
        |    "Trimestre do Período de Apuração",
        |    "Mês do Período de Apuração",
        |    "Tipo de Crédito",
        |    "Natureza da Base de Cálculo dos Créditos",
        |    "Valor da Base de Cálculo das Contribuições",
        |    "Crédito vinculado à Receita Bruta Não Cumulativa: Tributada",
        |    "Crédito vinculado à Receita Bruta Não Cumulativa: Não Tributada",
        |    "Crédito vinculado à Receita Bruta Não Cumulativa: de Exportação",
        |    "Crédito vinculado à Receita Bruta Total"
        |FROM AllData
        |Where
        |    "Ano do Período de Apuração" = 2024
        |And
        |    "Mês do Período de Apuração" Like 'dez%'""".stripMargin)
    // LIKE is case-sensitive: "dezembro" matches, "Dez" does not
    assert(out.count() == 1)
    assert(out.columns.length == 10)
  }

  test("corpus query 3: SELECT * EXCEPT with filters (testes-sqls.txt:23)") {
    val out = run(
      """SELECT *
        |Except(
        |    "Crédito vinculado à Receita Bruta Total",
        |    "Crédito vinculado à Receita Bruta Não Cumulativa",
        |    "Mês do Período de Apuração"
        |)
        |FROM AllData
        |Where
        |    "Ano do Período de Apuração" = 2024
        |And
        |    "Trimestre do Período de Apuração" = 4
        |And
        |    "Mês do Período de Apuração" Like '%dez%'""".stripMargin)
    assert(out.count() == 1) // '%dez%' case-sensitive: only "dezembro"
    assert(!out.columns.contains("Mês do Período de Apuração"))
    assert(out.columns.length == NCols - 3)
  }

  test("corpus query 4: qualified star + SUBSTR projection/filter (testes-sqls.txt:40)") {
    val out = run(
      """SELECT
        |  AllData.*,
        |  SubStr("Período Apuração Crédito", 14, 4) AS Ano
        |FROM
        |  AllData
        |WHERE
        |  SubStr("Período Apuração Crédito", 14, 4) = '2019';""".stripMargin)
    assert(out.count() == 2)
    assert(out.columns.last == "Ano" && out.columns.length == NCols + 1)
  }

  test("corpus query 5: IS NOT NULL + ILIKE + BETWEEN + ORDER BY (testes-sqls.txt:52)") {
    val out = run(
      """SELECT *
        |FROM AllData
        |Where
        |    "Natureza da Base de Cálculo dos Créditos" is not null
        |And
        |    "Tipo de Operação" ILike '%entrada%'
        |And
        |    "Código de Situação Tributária (CST)" Between 50 And 66
        |ORDER BY
        |    "Código de Situação Tributária (CST)"""".stripMargin)
    val cst = out.select("Código de Situação Tributária (CST)")
    assert(cst.collect().map(_.getInt(0)).toSeq == Seq(55, 60, 66))
  }

  test("corpus query 6 VERBATIM: CTE + EXCEPT + REPLACE + RENAME + 3-key ORDER BY (testes-sqls.txt:64)") {
    val out = run(
      """-- Define a Common Table Expression (CTE) to add the 'Ano' column
        |WITH DadosComAno AS (
        |  SELECT
        |    *, -- Select all original columns from AllData
        |    -- Extract the year (4 characters starting from position 14)
        |    -- and cast it to an Integer. Assuming SubStr uses 1-based indexing.
        |    CAST(SubStr("Período Apuração Crédito", 14, 4) AS INTEGER) AS Ano
        |  FROM AllData -- Source table
        |)
        |-- Main SELECT statement operating on the CTE
        |SELECT
        |    * -- Select all columns from the CTE result ('AllData' columns + 'Ano') initially
        |
        |    -- Clause to exclude specific columns from the selection
        |    EXCEPT (
        |        "Valor Total Crédito",
        |        "Valor Crédito Data Transmissão"
        |    )
        |
        |    -- Clause to replace the content of a specific column
        |    REPLACE (
        |        -- Calculate the new value: first 12 characters of the original column.
        |        -- Assuming SubStr uses 1-based indexing.
        |        SubStr("Período Apuração Crédito", 1, 12)
        |        -- Assign the new value back to the same column name, effectively modifying it.
        |        AS "Período Apuração Crédito"
        |    )
        |
        |    -- Clause to rename a column *after* exclusion and replacement
        |    RENAME (
        |        "PER/DCOMP" AS "Pedido de Ressarcimento (PER)"
        |    )
        |
        |FROM DadosComAno -- Specify the source for the SELECT (our CTE)
        |
        |WHERE Ano >= 2019 -- Filter the rows based on the 'Ano' column created in the CTE
        |
        |ORDER BY
        |  Ano ASC,                         -- 1. Sort by the integer 'Ano' (ascending)
        |  "Período Apuração Crédito" ASC,  -- 2. Then sort by the *modified* period string (ascending)
        |  "Tipo Crédito" DESC;             -- 3. Finally, sort by 'Tipo Crédito' (descending)""".stripMargin)
    assert(out.count() == 4)
    assert(out.columns.contains("Pedido de Ressarcimento (PER)"))
    assert(!out.columns.contains("PER/DCOMP"))
    assert(!out.columns.contains("Valor Total Crédito"))
    assert(!out.columns.contains("Valor Crédito Data Transmissão"))
    assert(out.columns.length == NCols + 1 - 2)
    // REPLACE truncated the period string to its first 12 chars
    assert(out.select("Período Apuração Crédito").collect()
      .forall(_.getString(0) == "PAC 12345678"))
    // first sort key is the CTE-derived int year
    assert(out.select("Ano").collect().map(_.getInt(0)).toSeq == Seq(2019, 2019, 2020, 2021))
  }

  test("corpus example 2: RENAME preserves column order (testes-sqls.txt:117)") {
    val out = run(
      """SELECT *
        |RENAME("Trimestre do Período de Apuração" AS "New Name")
        |FROM AllData;""".stripMargin)
    assert(out.columns.length == NCols)
    assert(out.columns.indexOf("New Name") ==
      fixture().columns.indexOf("Trimestre do Período de Apuração"))
  }

  test("corpus example 3: IS NULL OR IS NOT NULL with backticks (testes-sqls.txt:123)") {
    val out = run(
      """SELECT *
        |FROM AllData
        |WHERE
        |    `CNPJ Base` IS NULL
        |OR
        |    `Ano do Período de Apuração` IS NOT NULL;""".stripMargin)
    assert(out.count() == 4)
  }

  test("corpus example 4: projection + LIMIT (testes-sqls.txt:132)") {
    val out = run(
      """SELECT
        |    `CNPJ Base`,
        |    "Ano do Período de Apuração"
        |FROM AllData
        |Limit 10;""".stripMargin)
    assert(out.count() == 4 && out.columns.length == 2)
  }

  test("corpus example 5: EXCEPT of two columns (testes-sqls.txt:141)") {
    val out = run(
      """SELECT *
        |EXCEPT(
        |    `CNPJ Base`,
        |    "Ano do Período de Apuração"
        |)
        |FROM AllData;""".stripMargin)
    assert(out.count() == 4 && out.columns.length == NCols - 2)
    assert(!out.columns.contains("CNPJ Base"))
  }

  test("corpus example 6: integer equality filter (testes-sqls.txt:151)") {
    assert(run(
      """SELECT *
        |FROM AllData
        |WHERE
        |    `Ano do Período de Apuração` = 2024;""".stripMargin).count() == 3)
  }

  test("corpus example 7: AND over int and string columns (testes-sqls.txt:157)") {
    assert(run(
      """SELECT *
        |FROM AllData
        |WHERE
        |    `Ano do Período de Apuração` = 2024
        |AND
        |    `CNPJ Base` = 'aa bb';""".stripMargin).count() == 0)
  }

  test("corpus example 8: AND over int and float comparison (testes-sqls.txt:166)") {
    assert(run(
      """SELECT *
        |FROM AllData
        |WHERE
        |    `Ano do Período de Apuração` = 2024
        |AND
        |    `Alíquota de PIS/PASEP (em percentual)` > 1.0;""".stripMargin).count() == 2)
  }

  test("corpus example 9: frequency GROUP BY with alias ORDER BY (testes-sqls.txt:175)") {
    val out = run(
      """SELECT
        |    `Ano do Período de Apuração`,
        |    `Mês do Período de Apuração`,
        |    COUNT(*) AS Frequency
        |FROM AllData
        |GROUP BY
        |    `Ano do Período de Apuração`,
        |    `Mês do Período de Apuração`
        |ORDER BY
        |    Frequency DESC""".stripMargin)
    assert(out.count() == 4)
  }

  test("corpus example 10: LIKE + IS NULL on float column (testes-sqls.txt:188)") {
    assert(run(
      """SELECT *
        |FROM AllData
        |WHERE
        |    `CNPJ Base` LIKE 'Saldo%'
        |AND
        |    `Alíquota de PIS/PASEP (em percentual)` IS NULL;""".stripMargin).count() == 1)
  }

  test("corpus example 11: SUBSTR + modulo + OR-grouped filter + '' comparison (testes-sqls.txt:196)") {
    val out = run(
      """SELECT
        |    `Ano do Período de Apuração`,
        |    "Trimestre do Período de Apuração",
        |    SubStr(`Natureza da Base de Cálculo dos Créditos`,1,16),
        |    -- Use Modulo Operator % to hide actual values
        |    `Valor da Base de Cálculo das Contribuições` % 117
        |FROM AllData
        |WHERE
        |    `Natureza da Base de Cálculo dos Créditos` LIKE '%Saldo%' -- Filter condition 1
        |AND ( -- Filter condition 2 (using OR)
        |    `Mês do Período de Apuração` = ''
        |    OR
        |    `Mês do Período de Apuração` IS NULL
        |);""".stripMargin)
    assert(out.count() == 1)
  }

  test("corpus example 12 VERBATIM: EXCEPT of four columns + ILIKE (testes-sqls.txt:216)") {
    val out = run(
      """SELECT *
        |EXCEPT( -- List columns to exclude
        |    `Mês do Período de Apuração`,
        |    `Crédito vinculado à Receita Bruta Não Cumulativa`,
        |    `Crédito vinculado à Receita Bruta Cumulativa (Valores Excluídos)`,
        |    `Crédito vinculado à Receita Bruta Total`
        |)
        |FROM AllData
        |WHERE -- Apply filters
        |    `Ano do Período de Apuração` = 2024
        |AND
        |    `Trimestre do Período de Apuração` = 4
        |AND
        |    `Mês do Período de Apuração` ILIKE '%dez%';""".stripMargin)
    assert(out.count() == 2) // ILIKE: "dezembro" and "Dez" both match
    assert(out.columns.length == NCols - 4)
  }
}
