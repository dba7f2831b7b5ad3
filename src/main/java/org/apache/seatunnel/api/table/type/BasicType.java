package org.apache.seatunnel.api.table.type;

/**
 * Basic scalar type tokens (Graft shim of the reference's public
 * seatunnel-api/.../type/BasicType.java constants), mapped onto Spark DDL
 * spellings.
 */
public final class BasicType<T> implements SeaTunnelDataType<T> {
    private final String ddl;

    private BasicType(String ddl) {
        this.ddl = ddl;
    }

    @Override
    public String typeName() {
        return ddl;
    }

    public static final BasicType<String> STRING_TYPE = new BasicType<>("string");
    public static final BasicType<Boolean> BOOLEAN_TYPE = new BasicType<>("boolean");
    public static final BasicType<Byte> BYTE_TYPE = new BasicType<>("tinyint");
    public static final BasicType<Short> SHORT_TYPE = new BasicType<>("smallint");
    public static final BasicType<Integer> INT_TYPE = new BasicType<>("int");
    public static final BasicType<Long> LONG_TYPE = new BasicType<>("bigint");
    public static final BasicType<Float> FLOAT_TYPE = new BasicType<>("float");
    public static final BasicType<Double> DOUBLE_TYPE = new BasicType<>("double");
    public static final BasicType<Void> VOID_TYPE = new BasicType<>("void");
}
